package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory: the entrypoint a user migrating from the
  * reference pipeline starts with. Returns a builder pre-wired with the
  * engine's posture so the library's contracts hold without per-app conf
  * spelunking:
  *
  *  - graft's native expressions registered cluster-wide
  *    ([[graft.expressions.GraftExtensions]] — `graft_vec_dot` reaches
  *    SQL/views, not just the Scala API);
  *  - UTC session timezone (every timestamp contract in the engine, and
  *    the reference's Postgres convention);
  *  - ANSI mode on (Spark 4 default, stated here because the engine's
  *    guards — `try_element_at`, empty-string cast guards, scaled-long
  *    folds — are written against it);
  *  - AQE left enabled with skew-join handling (the runtime half of the
  *    skew story; `ops.Skew` is the explicit half).
  *
  * Deliberately NOT set: `shuffle.partitions` / broadcast threshold —
  * those are deployment-sized knobs (local[32] wants 32; a 1000-executor
  * cluster wants thousands); callers size them via the parameters.
  */
object GraftSession {

  def builder(appName: String = "graft",
              shufflePartitions: Option[Int] = None,
              autoBroadcastMb: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    val b1 = shufflePartitions.fold(b)(n =>
      b.config("spark.sql.shuffle.partitions", n))
    autoBroadcastMb.fold(b1)(mb =>
      b1.config("spark.sql.autoBroadcastJoinThreshold", mb * 1024L * 1024L))
  }
}
