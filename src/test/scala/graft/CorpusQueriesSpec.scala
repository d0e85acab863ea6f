package graft

import graft.queries.CorpusQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Invariants for the corpus-layout operators (x62–x84) on the sf0.001
  * tables — the value-level check is the DuckDB oracle; these lock the
  * structural contracts that survive any corpus (dense shard offsets,
  * power-of-two buckets, bounded collision index, damped-rank floor,
  * banded-aHash recall vs the brute-force ground truth). */
class CorpusQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String): DataFrame =
    CorpusQueries.defs(name)(spark, sf)

  test("x97: content-defined boundaries resynchronize after an insertion") {
    import spark.implicits._
    // two docs: B = A with a short prefix inserted. Fixed-size chunking
    // would re-frame everything after the insertion; CDC boundaries are
    // anchored on local content, so the tail chunks re-align and dedup.
    val a = (1 to 40).map(i => s"tok$i word$i").mkString(" ")
    val docs = Seq((1L, a), (2L, s"INSERTED PREFIX $a")).toDF("doc_id", "text")
    // replicate the operator on a custom frame via the registered query's
    // expression by substituting the documents table — run the same body
    // through a temp view is overkill; instead assert on the catalog query
    // at sf0.001 plus a direct re-derivation here
    def chunks(text: String): Seq[String] = {
      val bounds = (8 until text.length).filter { i =>
        // 1-based position i, trailing 8 chars: positions i-7..i
        val h = (i - 8 until i).foldLeft(0L) { (acc, j0) =>
          (acc * 31 + text.charAt(j0).toInt) % 2147483647L
        }
        h % 32 == 0
      }
      val starts = 1 +: bounds.map(_ + 1)
      val ends = bounds :+ text.length
      starts.zip(ends).map { case (s, e) => text.substring(s - 1, e) }
    }
    val ca = chunks(a).toSet
    val cb = chunks(s"INSERTED PREFIX $a").toSet
    // most of A's chunks survive verbatim in B (boundaries resync)
    val shared = ca.intersect(cb).size
    assert(shared >= ca.size / 2, s"only $shared of ${ca.size} chunks resync")
    // and the engine agrees with the scala re-derivation on dup counts
    val got = CorpusQueries.defs("x97_cdc_chunks")(spark, sf)
    assert(got.columns.toSeq ==
      Seq("doc_id", "n_chunks", "n_dup_chunks", "dup_ppm"))
    val row = got.filter(col("doc_id") === 0L).collect().head
    assert(row.getLong(1) >= 1L) // at least one chunk per doc
    // cross-check one document's chunk count against the re-derivation
    val doc0 = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") === 0L).select("text").as[String].head()
    assert(row.getLong(1) == chunks(doc0).length.toLong)
  }

  test("div truncates toward zero on negatives, matching DuckDB // (x72/x74 day numbers)") {
    import spark.implicits._
    // DuckDB 1.x verified: -7 // 2 = -3 (truncation, not floor). The same
    // values here lock the cross-engine day/week-number parity for
    // pre-epoch timestamps
    val got = Seq(-7L, 7L, -86400001L, 86400001L).toDF("x")
      .selectExpr("x div CASE WHEN abs(x) < 100 THEN 2 ELSE 86400000 END")
      .as[Long].collect().toSeq
    assert(got == Seq(-3L, 3L, -1L, 1L))
  }

  test("x68: approx_percentile accuracy tracks the largest source (exactness regime)") {
    // the guard computes accuracy = max(10000, largest per-source count);
    // at this SF the constant floor applies, and the produced bins match
    // EXACT quantiles computed independently
    val rows = q("x68_quantile_bins").collect()
    val bySource = rows.filter(!_.isNullAt(2)).groupBy(_.getString(1))
    bySource.foreach { case (_, rs) =>
      val chars = rs.map(_.getLong(2)).sorted
      def quart(p: Double): Long = {
        // quantile_disc semantics: smallest value with cume_dist >= p
        val idx = math.ceil(p * chars.length).toInt - 1
        chars(math.max(idx, 0))
      }
      rs.foreach { r =>
        val (c, bin) = (r.getLong(2), r.getLong(3))
        val expect =
          if (c <= quart(0.25)) 0L else if (c <= quart(0.5)) 1L
          else if (c <= quart(0.75)) 2L else 3L
        assert(bin == expect, s"n_chars=$c bin=$bin expect=$expect")
      }
    }
  }

  test("x85: each supplier takes the true majority label of its customers") {
    val rows = q("x85_label_propagation").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent recomputation from the raw tables
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_suppkey").isNotNull)
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val bySupp = edges.groupBy(_._2)
    assert(rows.keySet == bySupp.keySet)
    bySupp.foreach { case (sp, es) =>
      val labels = es.map(_._1 % 7)
      val (expLabel, _) = labels.groupBy(identity).view.mapValues(_.size)
        .toSeq.maxBy { case (l, n) => (n, -l) }
      val (nNbrs, label) = rows(sp)
      assert(nNbrs == es.length && label == expLabel,
        s"supplier $sp: got ($nNbrs, $label), expected (${es.length}, $expLabel)")
    }
  }

  test("x86: KMV estimates are internally consistent across all source pairs") {
    val rows = q("x86_kmv_set_ops").collect()
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source").isNotNull && col("doc_id").isNotNull)
      .select("source").distinct().count()
    assert(rows.length == (sources * (sources - 1) / 2).toInt)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (ea, eb, eu, ei) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sa < sb)
      assert(ea >= 1 && eb >= 1 && eu >= 1)
      assert(ei == math.max(ea + eb - eu, 0L))
      // disjoint doc_id spaces at this SF: the union estimate must sit
      // near a+b, far above either side alone
      assert(eu > math.max(ea, eb), s"($sa,$sb): union $eu vs $ea/$eb")
    }
  }

  test("x62: shards partition the corpus with dense per-shard offsets") {
    val rows = q("x62_shard_assign").collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isNotNull).count()
    assert(rows.length == docs)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      assert(0 <= shard && shard < 8)
      val offsets = rs.map(_.getLong(2)).sorted
      assert(offsets.toSeq == (0L until rs.length).toSeq,
        s"shard $shard offsets not dense")
    }
  }

  test("x63: weighted sample is k rows ranked by nondecreasing priority") {
    val rows = q("x63_weighted_sample").orderBy("rank").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val pris = rows.map(_.getLong(2))
    assert(pris.zip(pris.tail).forall { case (a, b) => a <= b })
  }

  test("x64: buckets are powers of two and accounting is consistent") {
    val rows = q("x64_length_buckets").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, nDocs, sumTok, waste, nBatches) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((bucket & (bucket - 1)) == 0 && bucket > 0, s"bucket $bucket")
      assert(waste == bucket * nDocs - sumTok && waste >= 0)
      assert(nBatches >= 1 && nBatches <= nDocs)
    }
  }

  test("x65: diversity stats are internally bounded") {
    q("x65_token_diversity").collect().foreach { r =>
      val (n, k, c2, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(k <= n)
      assert(c2 >= n) // Σc² ≥ Σc
      assert(c2 <= n * n)
      assert(0 <= ppm && ppm <= 1000000L)
    }
  }

  test("x66: overlap matrix is strict-upper-triangular with positive counts") {
    q("x66_source_overlap").collect().foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 1)
    }
  }

  test("x67: damped ranks respect the 0.15 floor and mass conservation") {
    val rows = q("x67_pagerank_step").collect()
    assert(rows.nonEmpty)
    rows.foreach { r => assert(r.getLong(2) >= 150000L) }
    // total damped in-mass cannot exceed 0.85 × (customers × 10^6) + floor terms
    val customers = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey")).distinct().count()
    val totalIn = rows.map(r => r.getLong(2) - 150000L).sum
    assert(totalIn <= 850000L * customers)
  }

  test("x69: OLS surface is exact integers with the one double division") {
    val rows = q("x69_ols_fit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (num, den, slope) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(den > 0, "token counts must vary within a source")
      assert(slope == num.toDouble / den.toDouble)
    }
  }

  test("x70: vocabulary growth is cumulative and bounded by 20 buckets") {
    val rows = q("x70_vocab_growth").orderBy("bucket").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val sizes = rows.map(_.getLong(2))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b || a == b })
    assert(sizes.last == rows.map(_.getLong(1)).sum)
  }

  test("x71: purity is a valid majority share per cell") {
    val rows = q("x71_cluster_purity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, majorN, ppm) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(majorN <= n && majorN >= 1)
      assert(ppm == majorN * 1000000L / n)
    }
    val labeled = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("label").isNotNull).count()
    assert(rows.map(_.getLong(1)).sum == labeled)
  }

  test("x72: trailing window sums dominate the day's own totals") {
    val rows = q("x72_daily_activity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) >= r.getLong(2)) // ma7_n ≥ n_events
      assert(r.getLong(5) >= r.getLong(3)) // ma7_cents ≥ cents (cents ≥ 0)
    }
  }

  test("x73: stages are ordered and timestamps strictly increase along the funnel") {
    val rows = q("x73_funnel_stages").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getLong(4)
      val present = Seq(1, 2, 3).map(i => !r.isNullAt(i))
      assert(present.count(identity) == stage)
      // prefix property: a reached stage implies all earlier ones
      assert(present.zip(present.tail).forall { case (a, b) => a || !b })
      if (stage == 3)
        assert(r.getLong(1) < r.getLong(2) && r.getLong(2) < r.getLong(3))
    }
  }

  test("x74: cohort week 0 holds every cohort member and offsets are nonnegative") {
    val rows = q("x74_retention_cohorts").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, rs) =>
      val at0 = rs.find(_.getLong(1) == 0L)
      assert(at0.isDefined, "every cohort has an offset-0 row")
      assert(rs.forall(_.getLong(1) >= 0))
      assert(rs.forall(_.getLong(2) <= at0.get.getLong(2)),
        "no later offset can exceed the cohort's own size")
    }
  }

  test("x75: bitmask, keep and first-fail agree with the stage flags") {
    val rows = q("x75_filter_cascade").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (2 to 6).map(i => r.getBoolean(i))
      val mask = flags.zipWithIndex.map { case (b, i) => if (b) 1L << i else 0L }.sum
      assert(r.getLong(7) == mask)
      assert(r.getBoolean(8) == flags.forall(identity))
      val expectedFirstFail = flags.indexWhere(!_) match {
        case -1 => -1L
        case i => i.toLong
      }
      assert(r.getLong(9) == expectedFirstFail)
    }
  }

  test("x76: report counts partition the corpus") {
    val total = q("x76_cascade_report").collect().map(_.getLong(2)).sum
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs)
  }

  test("x77: encoding covers every token with ids in [0, 63]") {
    val rows = q("x77_vocab_encode").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 63))
    assert(rows.exists(_.getLong(2) == 1L)) // the top token is id 1
    // (doc, pos) is a key: one id per token occurrence
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      rows.length)
  }

  test("x78: mask spans sit inside their documents at ~5% token budget") {
    val rows = q("x78_span_mask").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      assert(r.getLong(3) == 3L)
    }
    // one span per 20 tokens: spans per doc ≥ 1
    assert(rows.groupBy(_.getLong(0)).forall(_._2.nonEmpty))
  }

  test("x79: four distinct-j negatives per query, none equal to the query") {
    val rows = q("x79_negative_pairs").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
      rs.foreach(r => assert(r.getLong(2) != qid))
    }
  }

  test("x80: interleave positions are a total order cycling through sources") {
    val rows = q("x80_interleave_order").collect()
    assert(rows.nonEmpty)
    val positions = rows.map(_.getLong(2))
    assert(positions.distinct.length == positions.length)
    // within any full leading cycle, all sources are distinct
    val nSrc = rows.map(_.getString(1)).distinct.length
    val firstCycle = rows.filter(_.getLong(2) < nSrc)
    assert(firstCycle.map(_.getString(1)).distinct.length == firstCycle.length)
  }

  test("x81: filtered ANN returns only opposite-parity neighbors, ranked") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("x81_filtered_ann").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      assert(emb(nid) % 2 != emb(qid) % 2)
      assert(nid != qid)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length))
    }
  }

  test("x82: z keys interleave the bucket bits reversibly") {
    val rows = q("x82_zorder_layout").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xb, yb, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // de-interleave and compare (8 bits per dimension)
      val x2 = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val y2 = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(x2 == xb && y2 == yb, s"z=$z xb=$xb yb=$yb")
    }
  }

  test("x83: SCD2 intervals are disjoint, ordered, and split on every revision") {
    val rows = q("x83_scd2_history").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(3) &&
        r.getLong(3) <= 3)
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val iv = rs.map(r => (r.getLong(2), r.getLong(3))).sorted
      iv.zip(iv.tail).foreach { case ((_, t1), (f2, _)) => assert(t1 < f2) }
    }
    // doc 6: revised at v1 (÷3) and v2 (÷2), present everywhere → 3 runs
    assert(rows.count(_.getLong(0) == 6L) == 3)
  }

  test("x84: banded aHash pairs equal the brute-force Hamming-3 ground truth") {
    def aHash(text: String): Option[Array[Long]] = {
      val bytes = text.getBytes("UTF-8")
      if (bytes.length < 64) None
      else {
        val b = bytes.take(64).map(x => (x & 0xff).toLong)
        val s = b.sum
        val bits = b.map(x => if (x * 64 >= s) 1L else 0L)
        Some((0 until 4).map(j =>
          (0 until 16).map(i => bits(j * 16 + i) << i).sum).toArray)
      }
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select("doc_id", "text").collect()
      .flatMap(r => aHash(r.getString(1)).map(r.getLong(0) -> _)).toMap
    val expected = (for {
      (a, ha) <- docs.toSeq; (b, hb) <- docs.toSeq if a < b
      ham = (0 until 4).map(j => java.lang.Long.bitCount(ha(j) ^ hb(j))).sum
      if ham <= 3
    } yield (a, b, ham.toLong)).sorted
    val got = q("x84_phash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == expected, s"got ${got.length} vs expected ${expected.length}")
  }

  test("x68: bins are quartile labels 0..3 and every labeled doc has one") {
    val rows = q("x68_quantile_bins").collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(2)).foreach { r =>
      assert(!r.isNullAt(3))
      val b = r.getLong(3)
      assert(0 <= b && b <= 3)
    }
  }

  test("x87: blocked pairs match a brute-force levenshtein over all prefixes") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"),
        graft.text.TextOps.normalize(col("text")).as("nm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // ground truth = ALL pairs within distance 4 on the 40-char prefix
    // whose blocks agree — the blocking scheme's own contract
    val expected = (for {
      (ida, na) <- docs.toSeq; (idb, nb) <- docs.toSeq if ida < idb
      if na.take(8) == nb.take(8)
      d = lev(na.take(40), nb.take(40)) if d <= 4
    } yield (ida, idb, d.toLong)).sorted
    val got = q("x87_blocked_editdist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == expected, s"got ${got.length} vs expected ${expected.length}")
    assert(got.nonEmpty)
  }

  test("x88: anonymity ladder is consistent with independently-derived counts") {
    val rows = q("x88_kanonymity").collect()
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val exact = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val gen = cust.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(rows.length == exact.size)
    assert(rows.map(_.getLong(2)).sum == cust.length.toLong)
    rows.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      assert(r.getLong(2) == exact(key))
      assert(r.getLong(3) == gen(key._1))
      val expectLevel =
        if (r.getLong(2) >= 10) 0L else if (r.getLong(3) >= 10) 1L else 2L
      assert(r.getLong(4) == expectLevel)
    }
  }

  test("x89: output triples are exactly the triangles of the above-mean graph") {
    val oc = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("k"), col("c_nationkey").as("cn"))
    val ls = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey").as("k2"), col("s_nationkey").as("sn"))
    val flows = oc.join(ls, col("k") === col("k2"))
      .filter(col("cn") =!= col("sn"))
      .select(least(col("cn"), col("sn")).as("a"),
        greatest(col("cn"), col("sn")).as("b"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val w = flows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = flows.length.toLong
    val edges = w.filter { case (_, cnt) => cnt * w.size > total }.keySet
    val expected = (for {
      (a, b) <- edges.toSeq; c <- edges.collect { case (`b`, x) => x }
      if edges((a, c))
    } yield (a, b, c)).sorted
    val got = q("x89_trade_triangles").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(got == expected, s"got ${got.length} vs expected ${expected.length}")
    got.foreach { case (a, b, c) => assert(a < b && b < c) }
  }

  test("x90: rebalance moves documents only onto the four new shards") {
    val rows = q("x90_ring_reshard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isNotNull).count()
    assert(rows.map(_._3).sum == docs)
    rows.foreach { case (o, n, _) =>
      assert(0 <= o && o < 8)
      assert(0 <= n && n < 12)
      // consistent-hash minimal movement: the old ring is a subset of the
      // new one, so a doc either keeps its shard or lands on a NEW shard
      assert(o == n || n >= 8, s"illegal move $o -> $n")
    }
    val moved = rows.collect { case (o, n, c) if o != n => c }.sum
    // expected moved fraction = 4/12; generous band for a small corpus
    assert(moved * 10 < docs * 7, s"moved $moved of $docs")
    assert(moved > 0)
  }

  test("x91: top collocations equal the brute-force PMI cross-ratio ranking") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(graft.text.TextOps.normalize(col("text")))
      .collect().map(_.getString(0)).map(_.split(" ").toSeq)
    val uni = texts.flatten.filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = texts.flatMap(t => t.zip(t.drop(1)))
      .filter { case (a, b) => a.nonEmpty && b.nonEmpty }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 5L)
    val expected = bi.toSeq.map { case ((a, b), cab) =>
      val score = cab * 1000000000L / (uni(a) * uni(b))
      (score, cab, a, b)
    }.sortBy { case (s2, cab, a, b) => (-s2, -cab, a, b) }.take(20)
      .map { case (s2, cab, a, b) => (a, b, cab, uni(a), uni(b), s2) }
    val got = q("x91_collocations").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("x92: related items equal the brute-force capped co-purchase ranking") {
    val w = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_suppkey").isNotNull)
      .groupBy(col("o_custkey"), col("l_suppkey")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s1 = w.groupBy(_._2).values.flatMap(
      _.sortBy { case (c, _, cnt) => (-cnt, c) }.take(20)).toSeq
    val s2 = s1.groupBy(_._1).values.flatMap(
      _.sortBy { case (_, sp, cnt) => (-cnt, sp) }.take(10)).toSeq
    val byCust = s2.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val shared = byCust.values.flatMap(sps =>
      for (a <- sps; b <- sps if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = shared.toSeq.groupBy(_._1._1).flatMap {
      case (sp, cands) =>
        cands.sortBy { case ((_, p), n) => (-n, p) }.take(3).zipWithIndex
          .map { case (((_, p), n), i) => (sp, i + 1L, p, n) }
    }.toSeq.sorted
    val got = q("x92_related_items").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("x93: frontier equals the brute-force pairwise dominance check") {
    val stats = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"),
        graft.text.TextOps.normalize(col("text")).as("nm"))
      .collect().map { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), toks.length.toLong,
          toks.distinct.length.toLong * 1000000L / toks.length)
      }.filter(_._2 > 0)
    // dominated: another doc is >= on both dimensions and > on at least one
    val expected = stats.filter { case (_, n, d2) =>
      !stats.exists { case (_, n2, dd) =>
        n2 >= n && dd >= d2 && (n2 > n || dd > d2)
      }
    }.map { case (id, n, d2) => (id, n, d2) }.toSeq.sorted
    val got = q("x93_pareto_docs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got == expected, s"got ${got.length} vs expected ${expected.length}")
    assert(got.nonEmpty)
  }

  test("x94: novelty equals the brute-force first-occurrence computation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        graft.text.TextOps.normalize(col("text")).as("nm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // word-bigram shingles with the short-document tail rule: a
    // single-token doc contributes the token itself
    def shingles(nm: String): Set[String] = {
      val t = nm.split(" ", -1)
      if (t.length >= 2) t.zip(t.drop(1)).map { case (a, b) => s"${a}_$b" }.toSet
      else Set(t(0))
    }
    val byDoc = docs.map { case (id, nm) => id -> shingles(nm) }.toMap
    val firstDoc = byDoc.toSeq.flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = byDoc.toSeq.map { case (id, gs) =>
      val novel = gs.count(g => firstDoc(g) == id).toLong
      (id, gs.size.toLong, novel, novel * 1000000L / gs.size)
    }.sorted
    val got = q("x94_shingle_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == expected, s"got ${got.length} vs expected ${expected.length}")
    // the lowest doc_id sees everything for the first time
    assert(got.head._4 == 1000000L)
  }

  test("x120 DSIR: selection flag consistent, corpus-only, tokenizer agrees with x10") {
    import spark.implicits._
    val dsir = SparkEntry.queries("x120_dsir_weights")(spark, sf)
    assert(dsir.filter(($"dsir_score_micro" > 0L) =!= $"selected").count() === 0)
    assert(dsir.filter($"doc_id" < 20).count() === 0)
    // n_feats counts exactly what x10's tokenCount counts — the hashed
    // features and the token stats must never drift apart on tokenizer
    // semantics, or the importance weights score a different document
    // than the stats describe
    val tok = SparkEntry.queries("x10_token_stats")(spark, sf)
      .filter($"doc_id" >= 20)
    val j = dsir.join(tok, "doc_id")
    assert(j.count() === dsir.count())
    assert(j.filter($"n_feats" =!= $"n_tokens").count() === 0)
    // every corpus doc with at least one token gets a score
    assert(dsir.count() === tok.filter($"n_tokens" > 0).count())
  }

  test("x127 Stupid Backoff: seen / backoff / OOV branches score by-hand values") {
    import spark.implicits._
    // train split (ids ≥ 20): unigrams a:3 b:3 c:1, N = 7;
    // train bigrams: (a b)×2, (b a), (a c), (c b)
    val docs = Seq(
      (20L, "a b a b"), (21L, "a c b"),
      // scored doc: "a b" seen bigram, "b z" OOV continuation,
      // "z c" backoff with seen unigram c
      (5L, "a b z c")).toDF("doc_id", "text")
    val spark2 = spark
    import graft.text.TextOps
    // run the catalog logic against a temp view seam: rebuild inline
    // (the query reads the documents table, so mirror its body here)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val tr = TextOps.tokenRows(docs, "doc_id", "text").filter($"tok" =!= "")
    val bg = tr.withColumn("prev", lag($"tok", 1).over(byDoc))
      .filter($"prev".isNotNull).select($"doc_id", $"prev", $"tok".as("cur"))
    val train = $"doc_id" >= 20
    val uc = tr.filter(train).groupBy($"tok").agg(count(lit(1)).as("c_uni"))
    val bc = bg.filter(train).groupBy($"prev", $"cur").agg(count(lit(1)).as("c_bi"))
    val nTok = broadcast(tr.filter(train).agg(count(lit(1)).as("n_toks")))
    val contrib = bg.filter($"doc_id" === 5L)
      .join(bc, Seq("prev", "cur"), "left")
      .join(uc.select($"tok".as("prev"), $"c_uni".as("c_prev")), Seq("prev"), "left")
      .join(uc.select($"tok".as("cur"), $"c_uni".as("c_cur")), Seq("cur"), "left")
      .crossJoin(nTok)
      .withColumn("c", expr(
        """CAST(floor(ln(CASE WHEN c_bi IS NOT NULL
           THEN CAST(c_bi AS DOUBLE) / CAST(c_prev AS DOUBLE)
           ELSE CAST(0.4 AS DOUBLE)
                * COALESCE(CAST(c_cur AS DOUBLE), CAST(0.5 AS DOUBLE))
                / CAST(n_toks AS DOUBLE) END)
           * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"""))
      .select($"prev", $"cur", $"c").as[(String, String, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    def m(v: Double) = math.floor(math.log(v) * 1e6).toLong
    // seen: S(b|a) = c(a b)/c(a) = 2/3
    assert(contrib(("a", "b")) == m(2.0 / 3.0))
    // OOV continuation: z unseen → 0.4·(½)/7
    assert(contrib(("b", "z")) == m(0.4 * 0.5 / 7.0))
    // backoff: bigram (z c) unseen, c seen → 0.4·1/7
    assert(contrib(("z", "c")) == m(0.4 * 1.0 / 7.0))
    // and the catalog surface scores exactly the corpus' doc set
    val out = SparkEntry.queries("x127_stupid_backoff")(spark2, sf)
    assert(out.filter($"n_bigrams" > 0 && $"mean_ll_micro".isNull).count() === 0)
    assert(out.filter($"mean_ll_micro" > 0.0).count() === 0) // log-probs ≤ 0
  }

  test("x131 Naive Bayes: by-hand likelihoods, symmetric-tie to smallest label, OOV default") {
    import spark.implicits._
    // train (ids ≥ 20): en = "a a b" (a:2 b:1, c_l 3), fr = "c c d"
    // (c:2 d:1, c_l 3); vocab = {a,b,c,d} → V = 4; priors ½/½.
    // doc 5 "a c": score(en) = m(½)+m(3/7)+m(1/7) == score(fr) by
    // symmetry → exact integer tie → pred = min(label) = "en".
    // doc 6 "a a": en wins on likelihood; actual label fr → correct=false.
    val docs = Seq(
      (20L, "a a b", "en"), (21L, "c c d", "fr"),
      (5L, "a c", "en"), (6L, "a a", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = graft.text.TextOps.nbLangId(docs, "doc_id", "text", "lang",
        trainPred = $"doc_id" >= 20)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    def m(v: Double) = math.floor(math.log(v) * 1e6).toLong
    val tieScore = m(0.5) + m(3.0 / 7.0) + m(1.0 / 7.0)
    assert(out(5L) == (("en", "en", tieScore, true)))
    assert(out(6L) == (("fr", "en", m(0.5) + 2 * m(3.0 / 7.0), false)))
    // self-trained docs classify themselves (likelihoods dominate)
    assert(out(20L)._2 == "en" && out(21L)._2 == "fr")
    // catalog surface: one row per doc, negative integer scores
    val cat = SparkEntry.queries("x131_nb_langid")(spark, sf)
    assert(cat.groupBy($"doc_id").count().filter($"count" > 1).count() === 0)
    assert(cat.filter($"score_micro" >= 0).count() === 0)
  }

  test("x133 char entropy: uniform/degenerate/empty cases score their exact micro values") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),       // one symbol -> 0 bits
      (2L, "aabb"),       // two equiprobable -> exactly 1.0 bits
      (3L, "abcd"),       // four equiprobable -> exactly 2.0 bits
      (4L, "a b"),        // three symbols incl. the space
      (5L, "!!!"))        // normalizes to empty -> all zeros
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def term(c: Long, n: Long) = math.floor(
      (c.toDouble / n.toDouble)
        * (math.log(n.toDouble / c.toDouble) / math.log(2.0)) * 1e6).toLong
    assert(out(1L) == ((4L, 1L, 0L, 0.0)))
    assert(out(2L) == ((4L, 2L, 1000000L, 1.0)))
    assert(out(3L) == ((4L, 4L, 2000000L, 2.0)))
    val t3 = 3 * term(1, 3)
    assert(out(4L) == ((3L, 3L, t3, t3.toDouble / 1e6)))
    assert(out(5L) == ((0L, 0L, 0L, 0.0)))
    // catalog surface: bounded by the 37-symbol normalized alphabet
    val cat = SparkEntry.queries("x133_char_entropy")(spark, sf)
    assert(cat.filter($"entropy_bits" < 0.0
      || $"entropy_bits" > math.log(37.0) / math.log(2.0)).count() === 0)
    assert(cat.filter($"n_distinct" > 37).count() === 0)
  }

  test("x136 source quality floor: per source, kept = top (n - n/4) by (quality, doc_id)") {
    val rows = SparkEntry.queries("x136_source_quality_floor")(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val n = g.length
      assert(g.forall(_._5 == n))                  // n_src consistent
      assert(g.count(_._6) == n - n / 4)           // quartile cut exact
      // the kept set is exactly the suffix of the (quality, doc_id) order
      val sorted = g.sortBy(t => (t._3, t._2))
      assert(sorted.map(_._4).toSeq == (1L to n).toSeq)
      assert(sorted.drop(n / 4).forall(_._6) && sorted.take(n / 4).forall(!_._6))
    }
    assert(rows.nonEmpty)
  }

  test("x138 lang mix: planted code-switch doc segments correctly; monolingual stays pure") {
    import spark.implicits._
    // chunkTokens = 2 so each vote window is tiny: doc 1 switches en→fr
    // mid-document (4 chunks: en, en, fr, fr... with filler every chunk
    // still holds one stopword), doc 2 is pure en, doc 3 has no
    // stopwords at all (und), doc 4 is empty after normalization
    val docs = Seq(
      (1L, "the cat and dog le chat et chien"),   // en en fr fr
      (2L, "the cat and dog"),                    // en en
      (3L, "zzz qqq www rrr"),                    // und und
      (4L, "!!!"))
      .toDF("doc_id", "text")
    val out = graft.text.TextOps.langMix(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    assert(out(1L) == ((4L, 2L, "en", 500000L, true)))
    assert(out(2L) == ((2L, 1L, "en", 0L, false)))
    assert(out(3L) == ((2L, 0L, "und", 0L, false)))
    assert(out(4L) == ((0L, 0L, "und", 0L, false)))
    // catalog surface: minority_ppm < 1e6, dominant never 'und' when langs exist
    val cat = SparkEntry.queries("x138_lang_mix")(spark, sf)
    assert(cat.filter($"minority_ppm" >= 1000000L).count() === 0)
    assert(cat.filter($"n_langs" > 0 && $"dominant_lang" === "und").count() === 0)
  }

  test("x143/x144: confusion diagonal equals x131 corrects; kappa replays from the component outputs") {
    import spark.implicits._
    val nb = SparkEntry.queries("x131_nb_langid")(spark, sf)
      .select($"doc_id", $"actual", $"pred_lang", $"correct").collect()
    val cm = SparkEntry.queries("x143_nb_confusion")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // matrix cells == direct counts; diagonal == correct counts
    val direct = nb.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.length.toLong).toMap
    assert(cm.view.mapValues(_._1).toMap == direct)
    val corrects = nb.count(_.getBoolean(3)).toLong
    assert(cm.collect { case ((a, p), (n, _, _)) if a == p => n }.sum == corrects)
    cm.groupBy(_._1._1).foreach { case (_, cells) =>
      assert(cells.values.map(_._3).sum <= 1000000L) // shares bounded
    }
    // kappa from the two components, exactly as the catalog computes it
    val docs = Tables.load(spark, sf, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull && $"lang".isNotNull)
    val rule = graft.text.TextOps.langIdDF(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbp = nb.map(r => r.getLong(0) -> r.getString(2)).toMap
    val keys = rule.keySet.intersect(nbp.keySet).toSeq
    val n = keys.length.toLong
    val agree = keys.count(k => rule(k) == nbp(k)).toLong
    val rl = keys.groupBy(rule).view.mapValues(_.length.toLong)
    val bl = keys.groupBy(nbp).view.mapValues(_.length.toLong)
    val peNum = rl.map { case (l, r) => r * bl.getOrElse(l, 0L) }.sum
    val out = SparkEntry.queries("x144_langid_agreement")(spark, sf)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(3)) == ((n, agree, peNum)))
    assert(out.getDouble(4) ==
      (n * agree - peNum).toDouble / (n * n - peNum).toDouble)
  }

  test("x146 apportionment: allocations sum EXACTLY to the budget, each within 1 of its exact share") {
    import spark.implicits._
    val out = SparkEntry.queries("x146_token_apportionment")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val budget = 1000000L
    assert(out.map(_._6).sum == budget)            // the Hamilton invariant
    val wTot = out.map(_._2).sum
    out.foreach { case (_, w, base, rem, extra, alloc) =>
      assert(base == w * budget / wTot && rem == w * budget % wTot)
      assert(extra == 0L || extra == 1L)
      assert(alloc == base + extra)
      // quota property: floor(share) <= alloc <= ceil(share) + nothing more
      assert(alloc >= base && alloc <= base + 1)
    }
    // extras land on the LARGEST remainders
    val sorted = out.sortBy(t => (-t._4, t._1))
    val k = sorted.count(_._5 == 1L)
    assert(sorted.take(k).forall(_._5 == 1L) && sorted.drop(k).forall(_._5 == 0L))
  }

  test("x149 Gini: equal lengths score (n-1)/n-free zero-ish floor; planted extremes replay exactly") {
    import spark.implicits._
    val out = SparkEntry.queries("x149_length_gini")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    // independent replay from the raw table
    val docs = Tables.load(spark, sf, "documents")
      .filter($"doc_id".isNotNull && $"n_chars".isNotNull && $"source".isNotNull)
      .select($"source", $"doc_id", $"n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).map { case (src, g) =>
      val xs = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      val tot = xs.sum
      val rw = xs.zipWithIndex.map { case (x, i0) => (2L * (i0 + 1) - 1) * x }.sum
      val num = rw - n * tot
      src -> ((n, tot, num, num.toDouble / (n * tot).toDouble))
    }
    assert(out == expect && out.nonEmpty)
    // Gini bounds: [0, 1) up to the discrete floor
    out.values.foreach { case (_, _, _, gmm) => assert(gmm >= 0.0 && gmm < 1.0) }
  }

  test("x148 freshness audit: per-type last-seen and lag replay from raw events") {
    import spark.implicits._
    val out = SparkEntry.queries("x148_freshness_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    val days = Tables.load(spark, sf, "events")
      .filter($"ts".isNotNull && $"event_type".isNotNull)
      .select($"event_type", expr("unix_millis(ts) div 86400000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = days.groupBy(_._1).view
      .mapValues(g => (g.map(_._2).max, g.length.toLong)).toMap
    val wm = byType.values.map(_._1).max
    val expect = byType.map { case (t, (last, n)) =>
      t -> ((last, n, wm, wm - last, wm - last > 7))
    }
    assert(out == expect && out.nonEmpty)
  }

  test("x147 SCD2 point-in-time: reconstruction at v2 equals the v2 snapshot exactly (round-trip law)") {
    import spark.implicits._
    val out = SparkEntry.queries("x147_scd2_pit")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id".isNotNull)
    val snap2 = docs.select($"doc_id",
        graft.text.TextOps.fingerprint(
          when($"doc_id" % 2 === 0, concat($"text", lit(" r2")))
            .otherwise($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == snap2 && out.nonEmpty)
  }

  test("x142 bootstrap: 32 replicates, Poisson(1)-mass weights, deterministic across runs") {
    import spark.implicits._
    val run1 = SparkEntry.queries("x142_bootstrap_ci")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    val nDocs = Tables.load(spark, sf, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull).count()
    assert(run1.map(_._1).toSeq == (0L until 32L).toSeq)
    run1.foreach { case (_, used, sw, _, mean) =>
      assert(used <= nDocs)
      // Σw concentrates around n (E[Poisson(1)] = 1): ±15% is ~7 sd at n=500
      assert(math.abs(sw - nDocs) <= nDocs * 0.15, s"sum_w=$sw n=$nDocs")
      assert(mean >= 0.0 && mean <= 1.0)
    }
    // replicates genuinely differ (different resamples)...
    assert(run1.map(_._3).distinct.length > 1)
    // ...and the whole thing is deterministic run-to-run
    val run2 = SparkEntry.queries("x142_bootstrap_ci")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(run1.toSeq == run2.toSeq)
  }

  test("x140 spike detection: full integer replay from daily counts; sub-7-day history never flags") {
    import spark.implicits._
    val out = SparkEntry.queries("x140_spike_detection")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    val daily = Tables.load(spark, sf, "events").filter($"ts".isNotNull)
      .select(expr("unix_millis(ts) div 86400000").as("day"))
      .groupBy($"day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    daily.zipWithIndex.foreach { case ((day, n), i) =>
      val trail = daily.slice(math.max(0, i - 7), i).map(_._2)
      val (s2, q) = (trail.sum, trail.map(v => v * v).sum)
      val dev = n * 7 - s2
      val spike = trail.length == 7 && dev > 0 && dev * dev > (q * 7 - s2 * s2) * 4
      assert(out(day) == ((n, trail.length.toLong, s2, q, spike)), s"day=$day")
    }
    assert(out.size == daily.length && daily.take(7).forall(d => !out(d._1)._5))
  }

  test("x137 recency EWMA: full independent replay from the raw events table") {
    import spark.implicits._
    val out = SparkEntry.queries("x137_recency_ewma")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val wts = (0 until 16).map(r => math.floor(math.pow(0.9, r) * 1e6).toLong)
    val ev = Tables.load(spark, sf, "events")
      .filter($"value".isNotNull && $"user_id".isNotNull)
      .select($"user_id", $"ts", $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).map { case (uid, g) =>
      val last = g.sortBy(t => (-t._2, -t._3)).take(16)
      val contribs = last.zipWithIndex.map { case (t, r) =>
        math.floor(t._4 * wts(r)).toLong }
      val den = last.indices.map(wts).sum
      uid -> ((last.length.toLong, contribs.sum, den,
        contribs.sum.toDouble / den.toDouble))
    }
    assert(out == expect && out.nonEmpty)
  }

  test("x175 curation funnel: dispositions are the first failing stage; every stage exercised; pool conserved") {
    import spark.implicits._
    val rows = SparkEntry.queries("x175_curation_funnel")(spark, sf)
      .select($"doc_id", $"q_keep", $"is_dup", $"contaminated",
        $"selected", $"disposition")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)]
      .collect().toSeq
    // exactly one row per pool doc (the funnel partitions the pool)
    val pool = Tables.load(spark, sf, "documents")
      .filter($"doc_id".isNotNull && $"text".isNotNull && $"doc_id" >= 20)
      .select($"doc_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == pool && rows.length == pool.size)
    // disposition = FIRST failing stage, recomputed from the flags
    rows.foreach { case (id, q, dup, ct, sel, disp) =>
      val want =
        if (!q) "low_quality"
        else if (dup) "near_dup"
        else if (ct) "contaminated"
        else if (!sel) "not_selected"
        else "kept"
      assert(disp == want, s"doc $id: disposition $disp, flags say $want")
    }
    // the corpus exercises every branch (threshold-overfitting guard)
    assert(rows.map(_._6).toSet == Set("low_quality", "near_dup",
      "contaminated", "not_selected", "kept"))
  }
}
