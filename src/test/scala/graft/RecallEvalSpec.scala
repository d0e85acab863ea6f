package graft

import graft.dedup.RecallEval
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** RecallEval: the parametrized LSH recall pre-flight (x113's engine).
  * Locks the properties that make the probe size a safe knob: nested
  * samples, linear (not quadratic) truth cost, and curves that stay
  * consistent as the probe grows.
  */
class RecallEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")

  private def curve(probePerStratum: Int): Map[Long, (Long, Long, Long)] = {
    val rows = RecallEval.lshRecallCurve(docs, "doc_id", "text",
      shingleK = 2, numHashes = 12, rowsPerBand = 3, tau = 0.25,
      probePerStratum = probePerStratum, stratifyCol = Some("source"))
      .collect()
    spark.catalog.clearCache()
    rows.map { case Row(b: Long, nt: Long, nf: Long, ppm: Long) =>
      b -> (nt, nf, ppm)
    }.toMap
  }

  test("probe sets are nested and stratified: k per stratum, k ⊂ k+2") {
    val p3 = RecallEval.probeSet(docs, "doc_id", 3, Some("source"))
      .collect().map(_.getLong(0)).toSet
    val p5 = RecallEval.probeSet(docs, "doc_id", 5, Some("source"))
      .collect().map(_.getLong(0)).toSet
    val nSources = docs.select("source").distinct().count()
    assert(p3.size == 3 * nSources, s"expected 3 per source, got ${p3.size}")
    assert(p5.size == 5 * nSources)
    assert(p3.subsetOf(p5), "larger probe must contain the smaller")
    // per-stratum coverage: every source contributes exactly 3
    val perSrc = docs.filter(col("doc_id").isin(p3.toSeq: _*))
      .groupBy("source").count().collect()
    assert(perSrc.forall(_.getLong(1) == 3))
  }

  test("global (unstratified) probe is a bounded deterministic top-k") {
    val a = RecallEval.probeSet(docs, "doc_id", 10, None)
      .collect().map(_.getLong(0)).toSeq
    val b = RecallEval.probeSet(docs, "doc_id", 10, None)
      .collect().map(_.getLong(0)).toSeq
    assert(a.size == 10 && a.toSet == b.toSet)
  }

  test("curves are consistent across probe sizes (3 vs 6 per stratum)") {
    val small = curve(3)
    val large = curve(6)
    assert(small.nonEmpty, "probe found no truth pairs at sf0.001")
    // nested probes only ADD truth pairs: every decile the small probe
    // sees, the large probe sees with at least as many pairs
    small.foreach { case (bucket, (ntS, nfS, _)) =>
      val (ntL, nfL, _) = large.getOrElse(bucket,
        fail(s"decile $bucket vanished when the probe grew"))
      assert(ntL >= ntS, s"decile $bucket lost truth pairs: $ntS -> $ntL")
      assert(nfL >= nfS, s"decile $bucket lost found pairs: $nfS -> $nfL")
    }
    // the candidate stage is fixed, so a decile fully recalled under the
    // LARGER truth set must also be fully recalled under its subset
    large.foreach { case (bucket, (_, _, ppmL)) =>
      if (ppmL == 1000000L && small.contains(bucket))
        assert(small(bucket)._3 == 1000000L,
          s"decile $bucket: perfect recall on the superset but not the subset")
    }
  }
}
