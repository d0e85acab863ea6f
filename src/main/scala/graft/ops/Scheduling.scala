package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Work-scheduling plans over bounded dimensions.
  *
  * Reference behavior mirrored: the reference pipeline fans file pulls
  * over a fixed worker pool (survivor_processing runner.py's sequential
  * per-source loop); re-expressed here as the makespan-balancing
  * assignment a distributed executor fleet wants.
  */
object Scheduling {

  /** Longest-processing-time (LPT) assignment of weighted groups to
    * `workers` identical workers: groups in descending (weight, name
    * asc) order each go to the currently least-loaded worker (ties to
    * the lowest worker id) — Graham's 4/3-approximation to the NP-hard
    * makespan optimum, the standard shard-to-executor balancing plan.
    *
    * `df` must carry one row per group: (groupCol, weightCol). The
    * group dimension is BOUNDED (sources, languages, shards — never
    * documents), so the per-group aggregate is collected to the driver
    * (the Skew.scala contract: a bounded action on a pre-aggregated
    * frame) and the O(k·log k + k·workers) greedy runs there; the plan
    * returns as a small DataFrame. State = `workers` loads — never
    * data-sized.
    *
    * Output: groupCol, weightCol (pass-through), `assign_rank` (order
    * the greedy placed it, 0-based), `worker` (0-based), `load_after`
    * (the chosen worker's load including this group).
    */
  def lptAssign(df: DataFrame, groupCol: String, weightCol: String,
                workers: Int): DataFrame = {
    val spark = df.sparkSession
    val rows = df
      .select(col(groupCol).cast("string"), col(weightCol).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    import spark.implicits._
    lptAssignRows(rows, workers).toDF(groupCol, weightCol, "assign_rank",
      "worker", "load_after")
  }

  /** [[lptAssign]]'s greedy over ALREADY-COLLECTED (group, weight) rows —
    * the seam the r17 driver-side training planners use so a caller that
    * has collected its bounded mass frame once doesn't pay a second
    * collect action per LPT plan. Identical ordering and tie rules. */
  def lptAssignRows(rows: Seq[(String, Long)],
                    workers: Int): Seq[(String, Long, Long, Long, Long)] = {
    require(workers > 0, s"workers must be positive, got $workers")
    val sorted = rows.sortBy { case (g, w) => (-w, g) }
    val loads = Array.fill(workers)(0L)
    sorted.zipWithIndex.map { case ((g, w), i) =>
      var best = 0
      var j = 1
      while (j < workers) {
        if (loads(j) < loads(best)) best = j
        j += 1
      }
      loads(best) += w
      (g, w, i.toLong, best.toLong, loads(best))
    }
  }
}
