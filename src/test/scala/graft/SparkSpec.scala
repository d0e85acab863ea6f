package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM-wide session — specs
  * run in a single forked JVM, so getOrCreate dedups). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlc = spark.sqlContext

  // release the engine's internal cache pins between tests — the suite
  // shares one session, so without this a 468-test run accumulates every
  // operator's registered pin (the r7 ADVICE leak, now first-class).
  // drainAll (not just drain): specs also pin frames of their own; after
  // a test completes nothing should stay cached, so clear the session
  // cache manager too (r8 ADVICE — the registry route covers engine
  // pins, this covers spec-owned ones).
  override protected def afterEach(): Unit = {
    graft.ops.InternalCaches.drainAll(spark)
    super.afterEach()
  }

  /** Run `body` with the given loggers silenced (levels restored after).
    * For DELIBERATE failure paths only — a test that provokes an
    * exception Spark's listener bus also logs at ERROR would otherwise
    * leave noise in a fully-green suite log, masking real errors. */
  def quietLoggers[A](names: Seq[String])(body: => A): A = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val prior = names.map(n => n -> LogManager.getLogger(n).getLevel)
    names.foreach(n => Configurator.setLevel(n, Level.OFF))
    try body
    finally prior.foreach { case (n, lvl) => Configurator.setLevel(n, lvl) }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.expressions.GraftFunctions.ensureRegistered(s)
    s
  }
}
