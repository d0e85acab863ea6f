package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; explicit salting remains necessary
  * when one side must aggregate BEFORE joining (AQE can't split a skewed
  * aggregation) or when the skew is known a priori (a "null key" bucket, a
  * celebrity user). These helpers implement the classic recipe:
  * replicate the small side `saltBuckets` times, scatter the big side's
  * hot keys uniformly across the buckets.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted into `saltBuckets` buckets.
    * `big` gets a deterministic per-row bucket (hash of all columns), while
    * `small` is replicated once per bucket — so each hot key's rows spread
    * over `saltBuckets` tasks instead of one straggler.
    * Semantics identical to `big.join(small, key, joinType)` for
    * 1:N joins (small side unique on key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full outer would emit one unmatched copy of a small-side row
    // PER REPLICA — only join types that never output unmatched small rows
    // preserve unsalted semantics (semi/anti qualify: they emit big-side
    // rows only)
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")(
        joinType.toLowerCase),
      s"saltedJoin preserves semantics only for inner/left/semi/anti joins, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Aggregate-then-join skew pattern: two-phase aggregation where the
    * first phase groups on (key, salt) — spreading a hot key's partial
    * aggregation over `saltBuckets` tasks — and the second phase merges the
    * partials per key. `partials` maps each aggregated column to the
    * expression that merges two partials (e.g. sum → sum, count → sum,
    * max → max). */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
                aggs: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head, aggs.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
