package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed (pre-partitioned) tables: the co-located-join tool. Writing
  * both sides of a recurring large-large join bucketed (and sorted) on the
  * join keys lets every subsequent join run with NO shuffle and NO sort —
  * the classic answer to "this join's exchange becomes the bottleneck at
  * 100 TB". Bucket counts should match (or divide) between the two sides;
  * size buckets so one bucket ≈ one task's worth of data at target scale.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — produces a
    * shuffle-free sort-merge join when bucketing lines up. */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
