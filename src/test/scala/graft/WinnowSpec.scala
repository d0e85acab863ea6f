package graft

import graft.dedup.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Substring-level dedup (x117/x118): the graft_winnow kernel against an
  * in-SQL reference formulation, pinned hand cases, and the span-merge
  * invariants the impact report relies on. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** The oracle's SQL-window formulation of winnow anchor selection,
    * run in Spark itself: per-position md5 16-grams, min of
    * h || lpad(pos, 9) over 8-gram windows, distinct full-window picks.
    * Independent of the kernel's deque/byte-compare implementation. */
  private def sqlAnchors(docs: org.apache.spark.sql.DataFrame) = {
    docs.createOrReplaceTempView("wdocs")
    spark.sql(
      """WITH grams AS (
           SELECT doc_id, i, md5(cast(substring(text, i, 16) AS BINARY)) AS h
           FROM (SELECT doc_id, text,
                   explode(sequence(1, length(text) - 15)) AS i
                 FROM wdocs WHERE length(text) >= 16)),
         wins AS (
           SELECT doc_id,
             min(concat(h, lpad(cast(i AS STRING), 9, '0'))) OVER
               (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS msk,
             count(*) OVER
               (PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS cnt
           FROM grams)
         SELECT DISTINCT doc_id, substring(msk, 1, 32) AS h,
           cast(substring(msk, 33, 9) AS BIGINT) AS pos
         FROM wins WHERE cnt = 8""")
  }

  test("graft_winnow equals the SQL-window reference on corpus docs") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
      .filter($"doc_id" < 40)
      .select($"doc_id", $"text")
    val kernel = Dedup.winnowAnchors(docs, "doc_id", "text")
      .select($"doc_id", $"pos", $"h")
    val ref = sqlAnchors(docs).select($"doc_id", $"pos", $"h")
    assert(kernel.count() > 0)
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("texts shorter than k+w-1 chars select no anchors") {
    val docs = Seq((1L, "x" * 22), (2L, "y" * 23), (3L, "")).toDF("doc_id", "text")
    val a = Dedup.winnowAnchors(docs, "doc_id", "text")
    assert(a.filter($"doc_id" === 1L).count() === 0)
    assert(a.filter($"doc_id" === 2L).count() > 0)
    assert(a.filter($"doc_id" === 3L).count() === 0)
  }

  test("a >=23-char substring shared by two docs yields a shared anchor and a span") {
    // distinct random-ish prefixes/suffixes, one 40-char common block
    val common = "the quick brown fox jumps over the lazy!"
    val d1 = s"AAAA unrelated head text 111 $common and a tail unlike the other"
    val d2 = s"completely different opening ${common} ZZZZ closing words 999"
    val docs = Seq((10L, d1), (20L, d2)).toDF("doc_id", "text")
    val spans = Dedup.winnowSpans(docs, "doc_id", "text")
    // both docs must report at least one repeated span that sits inside
    // the common block's footprint
    val byDoc = spans.collect().groupBy(_.getLong(0))
    assert(byDoc.keySet === Set(10L, 20L))
    val s1 = d1.indexOf(common) + 1
    val s2 = d2.indexOf(common) + 1
    assert(byDoc(10L).exists(r =>
      r.getAs[Long]("span_start") >= s1 &&
        r.getAs[Long]("span_end") <= s1 + common.length - 1))
    assert(byDoc(20L).exists(r =>
      r.getAs[Long]("span_start") >= s2 &&
        r.getAs[Long]("span_end") <= s2 + common.length - 1))
  }

  test("spans are disjoint within a doc; lengths and bounds consistent") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
    val spans = Dedup.winnowSpans(docs, "doc_id", "text")
      .join(docs.select($"doc_id", length($"text").cast("long").as("len")), "doc_id")
    val bad = spans.filter(
      $"span_len" =!= $"span_end" - $"span_start" + 1 ||
        $"span_start" < 1 || $"span_end" > $"len" || $"n_anchors" < 1)
    assert(bad.count() === 0)
    val overlaps = spans.as("a").join(spans.as("b"),
      $"a.doc_id" === $"b.doc_id" && $"a.span_start" < $"b.span_start" &&
        $"b.span_start" <= $"a.span_end")
    assert(overlaps.count() === 0)
  }

  test("x118 impact recomposes exactly from x117 spans") {
    val impact = SparkEntry.queries("x118_substring_impact")(spark, sfDir)
    val spans = SparkEntry.queries("x117_substring_spans")(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
    val fromSpans = spans
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy($"source").agg(sum($"span_len").as("rep"))
    val drift = impact.join(fromSpans, Seq("source"), "left")
      .filter($"repeated_chars" =!= coalesce($"rep", lit(0L)) ||
        $"docs_flagged" > $"n_docs" ||
        $"repeated_chars" > $"total_chars")
    assert(drift.count() === 0)
  }

  test("x124 scrub: cleaned length + removed chars recomposes the original exactly") {
    val scrub = SparkEntry.queries("x124_span_scrub")(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
    val joined = scrub.join(
      docs.select($"doc_id", $"text", length($"text").cast("long").as("len")),
      "doc_id")
    // the segment walk must cut EXACTLY the span chars — no off-by-one
    // survives this on 500 real docs
    val drift = joined.filter(
      length($"cleaned").cast("long") + $"removed_chars" =!= $"len")
    assert(drift.count() === 0)
    // docs without spans pass through verbatim
    val untouched = joined.filter($"n_spans" === 0 && $"cleaned" =!= $"text")
    assert(untouched.count() === 0)
    // scrubbed docs no longer contain their first span's text
    val spans = SparkEntry.queries("x117_substring_spans")(spark, sfDir)
    val firstSpan = spans.groupBy($"doc_id")
      .agg(min(struct($"span_start", $"span_end")).as("f"))
      .join(docs, "doc_id")
      .select($"doc_id", expr(
        "substring(text, CAST(f.span_start AS INT), CAST(f.span_end - f.span_start + 1 AS INT))")
        .as("cut"))
    val stillThere = scrub.join(firstSpan, "doc_id")
      .filter(expr("instr(cleaned, cut) > 0") && length($"cut") >= 23)
    // a cut substring CAN legitimately survive if the doc contained it at
    // another, unflagged offset — require only that the common case drops
    assert(stillThere.count() < firstSpan.count() / 2)
  }

  test("x119 spans start at 16-grams that verifiably appear in the benchmark set") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull)
    val bench = docs.filter($"doc_id" < 20)
      .select($"text").collect().map(_.getString(0))
    val spans = SparkEntry.queries("x119_contamination_spans")(spark, sfDir)
    val rows = spans.join(docs.select($"doc_id", $"text"), "doc_id")
      .select($"text", $"span_start", $"doc_id").collect()
    assert(rows.nonEmpty)
    // winnow anchors are exact md5 16-gram matches (no false positives),
    // so the gram at every span head must literally occur benchmark-side
    rows.foreach { r =>
      val start = r.getLong(1).toInt - 1
      val g = r.getString(0).substring(start, start + 16)
      assert(bench.exists(_.contains(g)),
        s"doc ${r.getLong(2)}: span-head gram not found in benchmark docs")
    }
    // and no contamination span may sit on a benchmark doc
    assert(spans.filter($"doc_id" < 20).count() === 0)
  }

  test("x117 plan: both windows partitioned, census side broadcast") {
    val plan = SparkEntry.queries("x117_substring_spans")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val winLines = plan.split("\n").filter(_.contains("windowspecdefinition"))
    assert(winLines.nonEmpty)
    // every window node partitions by doc_id — an empty partitionSpec
    // (single-partition window) must never appear in this plan
    assert(winLines.forall(_.contains("doc_id")))
    assert(plan.contains("BroadcastExchange"))
  }
}
