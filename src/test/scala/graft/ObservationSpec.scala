package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: `Dataset.observe` rides metrics on the SAME
  * action that materializes the data — the ingest/row-count counters a
  * production pipeline reports without paying a second scan (the
  * alternative, `df.count()` before the write, doubles every source
  * read at 100 TB). The metrics attach at a chosen point in the plan, so
  * pre-filter scan volume and post-filter output volume are both
  * observable from one job. */
class ObservationSpec extends SparkSpec {

  test("observe: scan-level metrics collected by the materializing action itself") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val obs = Observation("bronze-ingest")
    val out = docs
      .observe(obs, count(lit(1)).as("rows_scanned"),
        sum(length(col("text"))).as("chars_scanned"),
        count(when(col("text").isNull, 1)).as("null_texts"))
      .filter(col("doc_id") % 2 === 0)          // metrics sit ABOVE the scan,
    out.write.format("noop").mode("overwrite").save() // below this filter
    val m = obs.get
    // the metrics saw the PRE-filter stream...
    val expectRows = docs.count()
    val expectChars = docs.agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(m("rows_scanned") == expectRows)
    assert(m("chars_scanned") == expectChars)
    assert(m("null_texts") == docs.filter(col("text").isNull).count())
    // ...which is strictly more than the post-filter output
    assert(out.count() < expectRows)
  }

  test("observe: per-stage metrics at two plan points in one job") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val scanObs = Observation("scan")
    val outObs = Observation("kept")
    val staged = docs
      .observe(scanObs, count(lit(1)).as("n"))
      .filter(col("n_chars") > 100)
      .observe(outObs, count(lit(1)).as("n"))
    staged.write.format("noop").mode("overwrite").save()
    val (nScan, nKept) = (scanObs.get("n").asInstanceOf[Long],
      outObs.get("n").asInstanceOf[Long])
    assert(nScan == docs.count())
    assert(nKept == docs.filter(col("n_chars") > 100).count())
    assert(nKept <= nScan)
  }
}
