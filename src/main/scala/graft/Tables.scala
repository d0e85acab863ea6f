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
    // The events table has shipped with two physical encodings of `ts`:
    // TIMESTAMP(NANOS) (which Spark 4 only reads as long nanos under the
    // legacy conf) and TIMESTAMP_MICROS (read natively). Dispatch on the
    // loaded type: only a LongType read needs the nanos→micros
    // floor-truncation (the same truncation DuckDB applies, so oracle
    // comparisons agree); native timestamp columns pass through untouched.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // Native micros read infers TIMESTAMP_NTZ; downstream event queries
          // (unix_millis, watermarks) expect TIMESTAMP. Every entry point pins
          // session tz = UTC, so this cast is instant-preserving.
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
    // NOTE the synthetic files are single parquet row groups, so every
    // scan is one task locally; a production lake splits naturally across
    // files/row groups. Deliberately NOT compensated with a repartition
    // here: that would shuffle document payloads through every query —
    // including the multimodal paths whose contract is zero payload
    // shuffles — and measured ~no bench benefit.
  }

}
