package graft

import graft.ops.Scheduling
import org.apache.spark.sql.Row

/** Unit coverage for LPT shard scheduling (x162): the greedy's placement
  * rule, its determinism, and the balance bound greedy list scheduling
  * guarantees. */
class SchedulingSpec extends SparkSpec {
  import spark.implicits._

  test("lptAssign: descending weights to the least-loaded worker, ties to the lowest ids") {
    // 2 workers: weights [9, 7, 5, 4, 3] → w0: 9+4=13? no —
    //   9→w0(9); 7→w1(7); 5→w1(12); 4→w0(13); 3→w1(15)
    val df = Seq(("a", 9L), ("b", 7L), ("c", 5L), ("d", 4L), ("e", 3L))
      .toDF("g", "n")
    val out = Scheduling.lptAssign(df, "g", "n", workers = 2)
      .orderBy("assign_rank").collect().toSeq
    assert(out == Seq(
      Row("a", 9L, 0L, 0L, 9L),
      Row("b", 7L, 1L, 1L, 7L),
      Row("c", 5L, 2L, 1L, 12L),
      Row("d", 4L, 3L, 0L, 13L),
      Row("e", 3L, 4L, 1L, 15L)))
  }

  test("lptAssign: equal weights order by group name; equal loads go to the lowest worker") {
    val df = Seq(("z", 5L), ("a", 5L), ("m", 5L)).toDF("g", "n")
    val out = Scheduling.lptAssign(df, "g", "n", workers = 3)
      .orderBy("assign_rank").collect().toSeq
    assert(out == Seq(
      Row("a", 5L, 0L, 0L, 5L),
      Row("m", 5L, 1L, 1L, 5L),
      Row("z", 5L, 2L, 2L, 5L)))
  }

  test("x162: greedy invariants on the catalog surface — balance bound, coverage, monotone ranks") {
    val out = graft.queries.TrainingQueries.defs("x162_lpt_schedule")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"n_tokens", $"assign_rank", $"worker",
        $"load_after")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._3).sorted == (0L until out.size.toLong))
    // replay the greedy
    val loads = scala.collection.mutable.ArrayBuffer.fill(8)(0L)
    out.sortBy(_._3).foreach { case (src, n, rk, w, la) =>
      val best = loads.zipWithIndex.minBy { case (l, i) => (l, i) }._2
      assert(w == best, s"$src (rank $rk) went to $w, greedy says $best")
      loads(best) += n
      assert(la == loads(best), s"$src load_after drifted")
      // descending weight order within the plan
      assert(out.filter(_._3 < rk).forall(p => p._2 >= n ||
        (p._2 == n && p._1 < src) || p._2 > n))
    }
    // greedy list scheduling bound: max − min load ≤ max single weight
    assert(loads.max - loads.min <= out.map(_._2).max,
      s"imbalance ${loads.max - loads.min} exceeds the largest shard")
    // every source exactly once
    assert(out.map(_._1).distinct.size == out.size)
  }
}
