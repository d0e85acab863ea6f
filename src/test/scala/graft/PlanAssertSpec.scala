package graft

/** Plan-shape assertions: the 100 TB claims the Scaladoc makes, locked in
  * CI. Each test parses the physical plan of a catalog query and asserts
  * the property that makes it scale — zero shuffled joins where every dim
  * is broadcast, a single exchange where the design says "one shuffle",
  * no single-partition exchange where a naive global window would have one.
  * A regression that silently de-broadcasts a join or re-introduces a
  * serial window fails here, not in a 100× production run.
  */
class PlanAssertSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Shuffle exchanges only — BroadcastExchange is the cheap kind and
    * doesn't count against a "no shuffle" claim. */
  private def shuffleExchanges(p: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).size

  test("q05 star join: every dimension broadcast, zero shuffled joins") {
    val p = plan("q05_star_join")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"shuffled join crept into the star join plan:\n$p")
  }

  test("q06 as-of join: exactly one shuffle (the union-tag window)") {
    val p = plan("q06_asof_join")
    assert(shuffleExchanges(p) == 1,
      s"as-of join should shuffle once, found ${shuffleExchanges(p)}:\n$p")
  }

  test("x22 token packing: no single-partition exchange (two-level prefix sum)") {
    val p = plan("x22_token_packing")
    assert(!p.contains("Exchange SinglePartition"),
      s"serial global window crept back into token packing:\n$p")
    assert(!p.contains("rangepartitioning"),
      s"global sort crept into token packing:\n$p")
  }

  test("x156 next-fit packing: one shuffle (by source), no windows, no serial exchange") {
    val p = plan("x156_nextfit_packing")
    assert(shuffleExchanges(p) == 1,
      s"next-fit packing should shuffle once (repartition by source), " +
        s"found ${shuffleExchanges(p)}:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"serial exchange crept into next-fit packing:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ("),
      s"the sequential recurrence must stay a mapPartitions scan, " +
        s"not a window:\n$p")
  }

  test("x158 best-fit packing: one shuffle (by source), no windows, no serial exchange") {
    val p = plan("x158_bestfit_packing")
    assert(shuffleExchanges(p) == 1,
      s"best-fit packing should shuffle once (repartition by source), " +
        s"found ${shuffleExchanges(p)}:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"serial exchange crept into best-fit packing:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window ("),
      s"the pool recurrence must stay a mapPartitions scan, not a window:\n$p")
  }

  test("x04 simhash: banded plan joins on band buckets, not a cross join") {
    val p = plan("x04_dedup_simhash")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join crept back into simhash pairing:\n$p")
  }

  test("x113 recall eval: probe truth is an equi-join on shingles, no cartesian") {
    val p = plan("x113_lsh_recall")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join crept into the recall eval:\n$p")
  }

  test("x52 rerank: stage-1 rank prunes via WindowGroupLimit; vectors join back broadcast-only") {
    val p = plan("x52_ann_rerank")
    // the shortlist ranking must keep top-k pruning (WindowGroupLimit) and
    // the float vectors must re-enter via broadcast joins — a SortMergeJoin
    // here would mean the full-precision side is being shuffled again
    assert(p.contains("WindowGroupLimit"), s"rank-20 pruning lost:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"vector join stopped broadcasting:\n$p")
  }

  test("x55 group top-k: object-hash aggregate with partial combine, no window sort") {
    val p = plan("x55_topk_per_source")
    // the whole point of the Aggregator form: bounded per-group state
    // combined map-side (ObjectHashAggregate partial_topkbyscore), never a
    // partition-wide WindowExec sort of every row
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate:\n$p")
    assert(p.contains("partial_"), s"map-side partial aggregation lost:\n$p")
    assert(!p.contains("Window"), s"window sort crept into group top-k:\n$p")
  }

  test("x129 k-means assignment: a pure projection — no joins, no windows in the scoring plan") {
    // the centroid grid is compiled into the expression tree as literals;
    // a regression to a join/window-based argmin shows up here
    val p = plan("x129_kmeans_train")
    assert(!p.contains("Join"), s"join crept into k-means assignment:\n$p")
    assert(!p.contains("Window"), s"window crept into k-means assignment:\n$p")
  }

  test("x135 prefix filter: candidates come from an equi-join on shingles, never an all-pairs join") {
    val p = plan("x135_prefix_filter_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join crept into the prefix filter:\n$p")
  }

  test("x163 gopher repetition: fully in-row — ZERO exchanges of any kind") {
    // the r10 plan paid two wide exchanges ((doc, k, gram) groupBy +
    // exploded position distinct); the metric is per-document, so the
    // r11 plan computes the interval union inside the row — a regression
    // back to a shuffle-based plan fails here
    val p = plan("x163_gopher_repetition")
    assert(shuffleExchanges(p) == 0,
      s"x163 is a pure per-row projection; an exchange crept in:\n$p")
  }

  test("x165 epoch order: two-level per-worker rank — no single-partition exchange, window keyed by range partition") {
    // 8 workers would cap a plain Window.partitionBy(worker) at 8 tasks
    // at any corpus size; rankWithinGroups ranks per range-partition and
    // adds broadcast offsets instead (q15's shape, grouped)
    val p = plan("x165_epoch_order")
    assert(!p.contains("Exchange SinglePartition"),
      s"serial/per-worker-only window crept into the epoch order:\n$p")
    assert(p.contains("windowspecdefinition(__pid"),
      s"rank window lost its partition key:\n$p")
  }

  test("catalog sweep: no cartesian products anywhere; single-partition exchanges only where documented") {
    // Documented exceptions. q15: only the max(id) scalar aggregate (one
    // pre-aggregated row per partition) — the allocation window itself is
    // partition-keyed, locked by the dedicated q15 test below. q23/q30/x54:
    // a whole-table scalar aggregate (MIN/MAX, global bigram mean) — the
    // single partition receives one pre-aggregated row per upstream
    // partition (map-side partial combine), not data; that is the correct
    // global-aggregate shape at any scale. x56: global bottom-k — each
    // partition pre-reduces to a ≤ k-row buffer before the final merge.
    // x57: the Σ√n_lang scalar, aggregated from one row per language.
    // x63: global bottom-k by weighted priority — the same ≤ k-row
    // pre-reduced merge as x56. x70: the cumulative window runs over the
    // ~20-row bucket dimension (data-derived width), plus the max(doc_id)
    // scalar — both bounded whatever the corpus size.
    // x77: the ranking window runs over the ≤ 63-row limited vocab frame.
    // x79: the corpus-count scalar (one pre-aggregated row per partition).
    // x80: the source-index window + n_sources scalar run over the ~20-row
    // source dimension; the per-document ranking window is source-keyed.
    // x89: the mean-flow scalar, aggregated from the ≤ C(|nation|,2)-row
    // cached flow table. x90: the ring collect_list — 192 vnode rows into
    // the one broadcast ring row, bounded by topology not corpus.
    // x103/x105: the corpus-count scalar (one pre-aggregated row per
    // partition, broadcast back), x79's class. x107: the max(day)
    // range-clip scalar, same one-row shape. x110: the digit-total
    // scalar over the ≤ 9-row digit dimension. x111: the corpus-count
    // scalar (the CDF itself is two-level prefix-summed, exchange-free).
    // x120: the two token-total scalars (Nt, Nc) — one pre-aggregated
    // count row per upstream partition, broadcast back into the ≤ 4096-
    // bucket log-weight frame; q23/x79's class.
    // x125/x126: the BM25 (n_docs, tot_dl) corpus-stats scalar — one
    // pre-aggregated row per partition into a single broadcast row;
    // q23/x79's class. x127: the n_toks training-total scalar, x120's
    // exact shape. x131: the vocab-size countDistinct + n_tot doc-count
    // scalars (both pre-aggregated one-row-per-partition merges broadcast
    // back into the bounded label dimension), x120's class. x140: the
    // trailing-frame window runs over the day CALENDAR dimension (one
    // pre-aggregated row per day — bounded by time span, not corpus),
    // x107's class. x143/x144: x131's training scalars (and x144's
    // whole-corpus agreement scalar — one pre-aggregated row per
    // partition into the single kappa row), the same class. x146: the
    // W/Σbase scalars and the largest-remainder window over the bounded
    // source dimension — x57's exact class. x148: the corpus-watermark
    // scalar over the bounded event-type dimension, q23/x79's class.
    // x157: the UniMax rank/prefix-sum/global-min windows over the
    // bounded source dimension (post-aggregation, one row per source) —
    // x146's exact class. x160/x161: the cumulative-rank window and
    // class-total scalars over the per-distinct-score aggregate
    // (bounded by the 1e6-value micro grid, not the corpus) — x111's
    // exact class. x164/x168: the compositions re-run x157's allocation
    // windows over the bounded source dimension — the same class
    // (x168's only data-sized work, the per-doc cumulative token
    // window, is source-keyed). x169: the Σstream_len scalar over the
    // bounded source masses (one pre-aggregated row per partition,
    // broadcast back) — q23/x79's class; its per-window total runs
    // partitioned BY window, never single. x170: x168's composition —
    // the same bounded-source UniMax windows; the cross-epoch rank
    // itself is two-level (__pid-keyed, pinned in the x165 test below).
    // x171: x170's chain again (the rescale adds only the driver-side
    // LPT over the bounded remaining-mass aggregate). x172: the two
    // mixture-total scalars (Σstream_len, Σq_mass — one pre-aggregated
    // row per partition, broadcast back into the bounded source
    // dimension), q23/x79's class.
    // Similarity family (x05/x06/x07/x15/x20/x30/x36/x48/x71/x129/x130/
    // x134): Partitioning.sizeAdaptive derives the CPU-dense rebalance
    // fan-out from plan-statistics input size (1 partition per 4 MB,
    // capped at defaultParallelism) — at THIS suite's KB-scale fixtures
    // that is correctly 1 (RoundRobinPartitioning(1) normalizes to
    // SinglePartition in the plan text); at production sizes the cap
    // binds and the exchange is cores-wide. PartitioningSpec pins the
    // clamp contract; these are scale-adaptive rebalances, not serial
    // bottlenecks.
    val sizeAdaptiveOk =
      Set("x05_ann_bruteforce", "x06_ann_bucketed", "x07_embed_neardup",
        "x15_ann_ivf", "x20_kmeans_step", "x30_kmeans_scalable",
        "x36_semantic_dedup", "x48_ann_recall", "x71_cluster_purity",
        "x129_kmeans_train", "x130_semdedup_kmeans", "x134_kmeans_ivf")
    val singlePartitionOk = sizeAdaptiveOk ++
      Set("q15_id_allocation", "q23_scalar_minmax", "q30_watermark_incremental",
        "x54_bigram_familiarity", "x56_bottomk_sample", "x57_temperature_mixture",
        "x63_weighted_sample", "x70_vocab_growth", "x77_vocab_encode",
        "x79_negative_pairs", "x80_interleave_order", "x82_zorder_layout",
        "x89_trade_triangles", "x90_ring_reshard", "x103_tfidf_keywords",
        "x105_ks_drift", "x107_rolling_actives", "x110_benford_audit",
        "x111_quantile_normalize", "x120_dsir_weights",
        "x125_bm25_topk", "x126_rrf_fusion", "x127_stupid_backoff",
        "x131_nb_langid", "x140_spike_detection", "x143_nb_confusion",
        "x144_langid_agreement", "x146_token_apportionment",
        "x148_freshness_audit", "x157_unimax_budget",
        "x160_quality_auc", "x161_quality_pr_sweep",
        "x164_loader_manifest", "x168_epoch_consumption",
        "x169_mixture_drift", "x170_multiepoch_order",
        "x171_elastic_rescale", "x172_curriculum_mixture",
        "x174_loader_rehearsal", "x175_curation_funnel")
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
        Seq(
          Option.when(p.contains("CartesianProduct"))(s"$name: cartesian product"),
          Option.when(p.contains("Exchange SinglePartition") &&
            !singlePartitionOk(name))(s"$name: single-partition exchange")
        ).flatten
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("q15 id allocation: two-level row_number, no single-partition window") {
    // allocateIds ranks the null-id subset per range partition and adds
    // broadcast offsets — a serial Window.orderBy would show up here as an
    // Exchange SinglePartition feeding a Sort + WindowExec. The one
    // permitted single-partition exchange is the max(id) scalar aggregate,
    // whose child is always a partial HashAggregate (one row per upstream
    // partition), never a Sort.
    val p = plan("q15_id_allocation")
    assert(p.contains("windowspecdefinition(__pid"),
      s"allocation window lost its partition key:\n$p")
    val lines = p.linesIterator.toVector
    lines.indices.filter(lines(_).contains("Exchange SinglePartition"))
      .foreach { i =>
        val child = lines.drop(i + 1).find(_.trim.nonEmpty).getOrElse("")
        assert(child.contains("HashAggregate") && child.contains("partial_"),
          s"single-partition exchange feeds a non-scalar-aggregate:\n$p")
      }
  }

  test("x103 tfidf: top-5 filter prunes via WindowGroupLimit before the sort") {
    val p = plan("x103_tfidf_keywords")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter should push down as a group limit:\n$p")
  }

  test("x102 grouping sets: one Expand, no repeated scans of the input") {
    val p = plan("x102_grouping_sets")
    assert(p.contains("Expand"), s"expected Expand-based grouping sets:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"grouping sets should scan the table once:\n$p")
  }

  test("x76 cascade: hub shape — no cache, and the (doc,tok) count exchange is REUSED at runtime") {
    // the r15 refactor: all four stage statistics ride one
    // partial-combined per-(doc, tok) count frame with no cached raw
    // token rows (the old shape serialized concurrent AQE branches on
    // the cache-fill lock), and the explicit isnotnull(doc_id) keeps
    // the vocab/perDoc subtrees canonical-equal so the shared exchange
    // computes ONCE (a regression forks it silently — census r15)
    val df = SparkEntry.queries("x76_cascade_report")(spark, sf)
    assert(!df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "x76 must not cache raw token rows (hub shape, r15)")
    // collect() drives THIS QueryExecution (df.write would spawn a new
    // one and leave df's adaptive plan un-finalized)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedQueryStage") || finalPlan.contains("ReusedExchange"),
      s"the (doc,tok) count exchange is no longer reused — the tokenize " +
        s"runs once per consumer branch again:\n$finalPlan")
  }

  test("x127 backoff: bigram-count hub cached, raw token frame feeds only two consumers") {
    // two caches by design (token rows: hub fill + unigram counts;
    // bigram hub: train counts + scored join); a third would mean a
    // consumer fell off a hub and re-reads wide data (the r14 disease)
    // count DISTINCT cached frames (cacheBuilder identity), not substring
    // hits — one cached frame prints once per consumer site, so a string
    // count can't see a lost cache, and >= can't see a third one
    val p = SparkEntry.queries("x127_stupid_backoff")(spark, sf)
      .queryExecution.optimizedPlan
    val caches = p.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cacheBuilder
    }.distinct.size
    assert(caches == 2, s"x127 hub-cache census drifted ($caches distinct " +
      s"InMemoryRelation, want exactly 2: token rows + bigram hub):\n$p")
  }

  test("q01 agg pushes the scan down to the projected columns only") {
    val p = plan("q01_agg_pricing")
    // the lineitem scan must prune to the 5 referenced columns — a scan
    // reading the full schema would move ~3× the bytes at 100 TB
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(p).getOrElse("")
    // (the toString truncates the schema line — assert the used columns
    // that fit and, decisively, the absence of every unused column)
    assert(Seq("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .forall(readSchema.contains), readSchema)
    assert(Seq("l_tax", "l_shipdate", "l_orderkey", "l_partkey", "l_suppkey")
      .forall(c => !readSchema.contains(c)), readSchema)
  }
}
