package graft

import graft.ops.Partitioning
import org.apache.spark.sql.functions._

/** [[graft.ops.Partitioning.sizeAdaptive]] — the r17 scale-adaptive
  * fan-out behind every CPU-dense repartition in the similarity module:
  * one partition per targetBytes of plan-statistics input, clamped to
  * [1, defaultParallelism]. The clamp bounds are the contract: a
  * KB-scale frame must not shred into cores× near-empty tasks (the r16
  * 8-vs-32-core contention signature), and a large frame must still fan
  * out to every core exactly as the pre-r17 `defaultParallelism` form
  * did. */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def dp = spark.sparkContext.defaultParallelism

  test("KB-scale frame collapses to one partition") {
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(Partitioning.sizeAdaptive(tiny) == 1)
  }

  test("a tiny target fans out, capped at defaultParallelism") {
    val df = spark.range(10000).select(col("id"),
      concat_ws("", (0 until 8).map(_ => md5(col("id").cast("string"))): _*)
        .as("pad"))
    // estimated size far exceeds 1-byte targets => the dp cap binds
    assert(Partitioning.sizeAdaptive(df, targetBytes = 1L) == dp)
  }

  test("count scales with the size/target ratio between the clamps") {
    val df = spark.range(50000).select(col("id"),
      md5(col("id").cast("string")).as("pad"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes > 0)
    // pick a target that lands strictly between the clamps, then check
    // the exact ceil-division contract against the plan statistic
    val target = (bytes / 3).toLong.max(1L)
    val expected = ((bytes + target - 1) / target)
      .min(BigInt(dp)).max(BigInt(1)).toInt
    assert(Partitioning.sizeAdaptive(df, targetBytes = target) == expected)
    assert(expected >= 1 && expected <= dp)
  }

  test("rejects non-positive targets") {
    val df = spark.range(10).toDF()
    intercept[IllegalArgumentException] {
      Partitioning.sizeAdaptive(df, targetBytes = 0L)
    }
  }
}
