package graft

import org.apache.spark.sql.SparkSession

/** The committed 10×-scale evidence (r12 verdict #7): time the gated
  * heavy chains at sf0.1 AND at the sf1-equivalent synthetic fixture
  * ([[ScaleFixture]] — the same fixture [[ScaleGateSpec]] trips on) in
  * one local[32] session, min-of-2 warm through the noop sink (Bench's
  * methodology), and print ONE JSON line for tools/bench_local.py to
  * embed as BENCH_LOCAL_r{N}.json's `scale10x` section — so the
  * scale-design grade rests on a tracked artifact rather than a spec
  * log. `vs_linear` = t(10×) / (10 · t(1×)); ≤ ~1 means the chain
  * scales at-or-below linear (sub-1 is normal: fixed per-job scheduling
  * amortizes as data grows — exactly the 100 TB argument).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ScaleBench [names...]
  */
object ScaleBench {

  /** Default = the r12-verdict gated-family set (IVFADC ANN, exact
    * prefix-filter join, maintained ANN index, secondary-sort packing,
    * per-doc n-gram coverage) PLUS the whole r13 >2×-of-twin band —
    * the rows whose "fixed overhead amortizes at scale" defense the r13
    * verdict asked to convert from census argument into measured
    * `vs_linear` evidence (r13 directive #1) — plus x177, the new
    * bitext scale path (directive #2). */
  private val defaultChains = Seq(
    "x123_ivf_pq_residual_ann",
    "x135_prefix_filter_join",
    "x151_ann_index_upsert",
    "x158_bestfit_packing",
    "x163_gopher_repetition",
    // r13 >2× band (directive #1) — ALL 17 rows, not just the named nine
    "x125_bm25_topk",
    "x126_rrf_fusion",
    "x130_semdedup_kmeans",
    "x132_pca_power",
    "x134_kmeans_ivf",
    "x143_nb_confusion",
    "x144_langid_agreement",
    "x153_opq_perm_recall",
    "x38_chunk_dedup",
    "x42_curation_v2",
    "x45_chunk_scrub",
    "x54_bigram_familiarity",
    "x75_filter_cascade",
    "x103_tfidf_keywords",
    "x120_dsir_weights",
    "x124_span_scrub",
    "x138_lang_mix",
    // bitext scale path (directive #2)
    "x177_bitext_margin_ivf",
    // r15 (r14 verdict #2): the band's last ungated rows — x127 after
    // its bigram-hub refactor, x83 (union-of-scans + one window, census
    // says floor), x76 (the r14 regression row, post cascade refactor),
    // x52 (the restamped sq8 row)
    "x127_stupid_backoff",
    "x83_scd2_history",
    "x76_cascade_report",
    "x52_ann_rerank",
    // r16 (r15 verdict #2): the band's four new entrants via twin-time
    // drift — gated here so every >2×-of-twin row carries measured
    // vs_linear evidence (x131 after its packed-argmax surgery)
    "x131_nb_langid",
    "x36_semantic_dedup",
    "x48_ann_recall",
    "x91_collocations")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fixture = sys.env.getOrElse("SPARK_GRAFT_SF10X_DIR",
      ScaleFixture.defaultDir)
    ScaleFixture.ensure(spark, sf01, fixture)
    val names = if (args.nonEmpty) args.toSeq else defaultChains

    def time(name: String, dir: String): Double = {
      def once(): Double = {
        graft.ops.InternalCaches.drainAll(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm: codegen + file listing
      math.min(once(), once())
    }

    val rows = names.map { n =>
      val t01 = time(n, sf01)
      val t10 = time(n, fixture)
      (n, t01, t10, t10 / (10 * t01))
    }
    val json = rows.map { case (n, t01, t10, r) =>
      f""""$n": {"sf01_sec": $t01%.3f, "sf10x_sec": $t10%.3f, "vs_linear": $r%.3f}"""
    }.mkString("{", ", ", "}")
    println(json)
    spark.stop()
  }
}
