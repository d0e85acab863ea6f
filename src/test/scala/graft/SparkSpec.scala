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
