package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-harness table access. The driver provides TPC-H-ish parquet tables
  * (TESTDATA.md); a production deployment would swap these for real
  * catalog/source reads (JDBC, lakehouse). Kept as one seam so every query
  * is scale-agnostic: `dir` is the only thing that changes between
  * sf0.001 smoke and a 100 TB lake path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    // The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    // Spark 4 refuses natively; read them as long nanos and floor-truncate
    // to micros — the same truncation DuckDB applies, so oracle comparisons
    // agree. All other tables read directly.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
    // NOTE the synthetic files are single parquet row groups, so every
    // scan is one task locally; a production lake splits naturally across
    // files/row groups. Deliberately NOT compensated with a repartition
    // here: that would shuffle document payloads through every query —
    // including the multimodal paths whose contract is zero payload
    // shuffles — and measured ~no bench benefit.
  }

}
