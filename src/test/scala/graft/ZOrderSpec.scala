package graft

import graft.ops.ZOrder
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zKey interleaves bits x-low (known values)") {
    // x=3 (011), y=5 (101) → z bits y2x2 y1x1 y0x0 = 10 01 11 = 39
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zKey($"x", $"y", bits = 3)).as[Long].head()
    assert(got == 39L)
    // identity strips: x alone occupies even bits
    val xOnly = Seq((5L, 0L)).toDF("x", "y")
      .select(ZOrder.zKey($"x", $"y", bits = 3)).as[Long].head()
    assert(xOnly == 17L) // 101 → 1 0 1 at bits 4,2,0
  }

  test("z-ordered layout prunes row groups for a 2-D box; unsorted twin reads everything") {
    val n = 1 << 16 // 256 × 256 grid, one row per (x, y) cell
    val grid = spark.range(n.toLong)
      .select((col("id") % 256).as("xb"), (col("id") / 256).cast("long").as("yb"))
      .withColumn("payload", col("xb") * 1000 + col("yb"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val zPath = s"$base/bylayout_z"
    val uPath = s"$base/bylayout_unsorted"
    ZOrder.writeZOrdered(grid, ZOrder.zKey(col("xb"), col("yb")), 16, zPath)
    grid.repartition(16).write.parquet(uPath) // same data, no clustering

    def boxScanRows(path: String): Long = {
      // no shuffle in the probe query: the scan stays a leaf of the one
      // and only stage, so its metric is directly observable
      val q = spark.read.parquet(path)
        .filter(col("xb") < 16 && col("yb") < 16) // a 16×16 corner box
        .select("payload").as[Long]
      val rows = q.collect()
      val (cnt, s) = (rows.length.toLong, rows.sum)
      val plan = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scanRows = plan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
      assert(cnt == 256 && s == (0 until 16).map(_ * 1000L).sum * 16 +
        (0 until 16).map(_.toLong).sum * 16)
      scanRows
    }

    val zRows = boxScanRows(zPath)
    val uRows = boxScanRows(uPath)
    // unsorted: every row group's (xb, yb) min/max spans the full range →
    // nothing skips, the scan surfaces all 65536 rows. z-ordered: the
    // box's z range [0, 1023] lives in ~1-2 of 16 range files (sampled
    // boundaries are inexact) → ≥ 75% of row groups skipped, measured
    assert(uRows == n.toLong, s"unsorted twin unexpectedly pruned: $uRows")
    assert(zRows <= n / 4, s"z layout pruned nothing: $zRows of $n")
    assert(zRows < uRows / 4, s"z=$zRows vs unsorted=$uRows")
  }
}
