package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins done scalably.
  *
  * A naive `a.ts BETWEEN b.ts - Δ AND b.ts` join has no equi-key, so Spark
  * plans a nested-loop — quadratic per key group and a non-starter at
  * scale. [[attributionJoin]] adds the standard time-bucketing rewrite:
  * both sides get an hour-granularity bucket; a probe row can only match
  * build rows in ⌈Δ/bucket⌉+1 adjacent buckets, so the join becomes an
  * EQUI-join on (key, bucket) followed by the exact range filter.
  * Identical semantics, shuffle-hash-joinable, skew-handleable — the range
  * predicate only ever evaluates within matching buckets.
  */
object RangeJoin {

  /** "Attribution window" interval join: for each probe row, every build
    * row of the same key whose timestamp lies in
    * [probe.ts − lookbackSec, probe.ts] (inclusive both ends).
    * Output: all probe columns + the requested build payload columns. */
  def attributionJoin(
      probe: DataFrame, build: DataFrame, key: String,
      probeTs: String, buildTs: String,
      lookbackSec: Long, payload: Seq[String],
      bucketSec: Long = 3600L): DataFrame = {
    require(lookbackSec > 0 && bucketSec > 0)
    require(buildTs != probeTs,
      "rename the build timestamp column so it differs from the probe's")
    // a [p−Δ, p] window reaches back at most ⌈Δ/bucket⌉ buckets
    val reach = ((lookbackSec + bucketSec - 1) / bucketSec).toInt
    val pBucket = floor(unix_micros(col(probeTs)) / (bucketSec * 1000000L))
    val bBucket = floor(unix_micros(col(buildTs)) / (bucketSec * 1000000L))
    // probe fans out to every bucket its window can reach
    val p = probe.withColumn("__pbk",
      explode(array((0 to reach).map(i => pBucket - i): _*)))
    val b = build
      .select((key +: buildTs +: payload).distinct.map(col): _*)
      .withColumn("__bbk", bBucket)
      .withColumnRenamed(key, "__bkey")
    p.join(b, col(key) === col("__bkey") && col("__pbk") === col("__bbk"))
      .filter(col(buildTs) >= col(probeTs) - expr(s"INTERVAL $lookbackSec SECOND") &&
        col(buildTs) <= col(probeTs))
      .drop("__pbk", "__bbk", "__bkey")
  }
}
