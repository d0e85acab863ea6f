package graft

import org.apache.spark.sql.SparkSession

/** Focused timing for a subset of catalog queries — min-of-2 warm through
  * the noop sink, same methodology as [[Bench]], for iterating on one
  * operator family without paying the full-catalog run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchSubset q1 q2 ..."
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sf).write.format("noop")
        .mode("overwrite").save()
      graft.ops.InternalCaches.drainAll(spark)
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm: codegen + file listing
    graft.ops.InternalCaches.drainAll(spark)
    val t1 = names.map(n => n -> once(n)).toMap
    val t2 = names.map(n => n -> once(n)).toMap
    names.foreach(n => println(f"$n%-28s ${math.min(t1(n), t2(n))}%.2f"))
    spark.stop()
  }
}
