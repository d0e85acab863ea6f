package graft

import graft.text.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (20L, "spark shuffle partition exchange plan"),
    (21L, "spark spark spark shuffle shuffle plan"),  // high tf on query terms
    (22L, "window rank order peer frame extent"),     // no query-term overlap
    (23L, "shuffle"),                                 // short doc: dl normalization
    (24L, "plan plan plan plan plan plan plan plan")  // common term, long doc
  ).toDF("doc_id", "text")

  test("bm25TopK: term overlap ranks, zero-overlap docs never appear") {
    val queries = Seq((1L, "spark shuffle")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "doc_id", k = 5)
      .orderBy($"rank").collect()
    val ids = out.map(_.getLong(2)).toSeq
    assert(!ids.contains(22L), "doc with no query term must not score")
    assert(!ids.contains(24L), "doc with no query term must not score")
    // 21 repeats both terms → highest; 23's single term in a 1-token doc
    // gets maximal length normalization
    assert(ids.head == 21L, s"ranking $ids")
    assert(out.forall(_.getLong(3) > 0))
    // scores strictly follow rank order with the id tiebreak
    val scores = out.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("bm25TopK: scores are integer micro-units, reproducible across runs") {
    val queries = Seq((1L, "spark shuffle"), (2L, "plan")).toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", "doc_id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("rrfFuse: both-list items outrank single-list items at equal ranks, all-integer") {
    val a = Seq((1L, 100L, 1L), (1L, 101L, 2L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 100L, 2L), (1L, 102L, 1L)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "doc_id", k = 3)
      .orderBy($"rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 100 appears in both lists: 1e9/61 + 1e9/62 beats either single score
    val s100 = 1000000000L / 61 + 1000000000L / 62
    assert(out.toSeq == Seq(
      (1L, 100L, s100),
      (2L, 102L, 1000000000L / 61),
      (3L, 101L, 1000000000L / 62)))
  }

  test("rrfFuse: id tiebreak is deterministic on equal fused scores") {
    val a = Seq((1L, 7L, 1L), (1L, 3L, 1L)).toDF("query_id", "doc_id", "rank")
    // same rank in a single list each → equal scores → lower id first
    val out = Retrieval.rrfFuse(a.filter($"doc_id" === 7L),
        a.filter($"doc_id" === 3L), "doc_id", 2)
      .orderBy($"rank").collect().map(_.getLong(2)).toSeq
    assert(out == Seq(3L, 7L))
  }

  test("x125/x126 catalog surface: k rows per query, ranks contiguous") {
    for (name <- Seq("x125_bm25_topk", "x126_rrf_fusion")) {
      val out = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").collect()
      val byQ = out.groupBy(_.getLong(0))
      assert(byQ.size == 8, s"$name query count")
      byQ.foreach { case (q, rs) =>
        assert(rs.map(_.getLong(1)).toSet == (1L to 5L).toSet, s"$name q=$q ranks")
      }
      spark.catalog.clearCache()
    }
  }
}
