package graft

import graft.text.TextOps
import org.apache.spark.sql.Row

/** Unit coverage for the round-9 trainer-loop operators: the iterated
  * BPE trainer's selection/application semantics (the properties the
  * x150 oracle relies on) and the x152 multi-probe recall surface. */
class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain: overlapping occurrences count, greedy non-overlap application") {
    // "a a a a": (a,a) occurs 3 times (overlapping count) but greedy
    // left-to-right application merges twice → [a_a, a_a]; round 2 then
    // merges the merged tokens themselves
    val docs = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, "doc_id", "text", nMerges = 2).collect()
    assert(m.toSeq == Seq(
      Row(1L, "a_a", 3L, 2L),
      Row(2L, "a_a_a_a", 1L, 1L)))
  }

  test("bpeTrain: round k counts see round k-1's merges") {
    // "b a b a b a": round 1 picks (b,a)×3 → [b_a, b_a, b_a]; round 2
    // picks (b_a,b_a)×2 → [b_a_b_a, b_a]; round 3 (b_a_b_a,b_a)×1
    val docs = Seq((1L, "b a b a b a")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, "doc_id", "text", nMerges = 3).collect()
    assert(m.toSeq == Seq(
      Row(1L, "b_a", 3L, 3L),
      Row(2L, "b_a_b_a", 2L, 2L),
      Row(3L, "b_a_b_a_b_a", 1L, 1L)))
  }

  test("bpeTrain: tiebreak is (count desc, a asc, b asc) — NOT the concatenated pair") {
    // all pairs occur once; lowest (a, b) wins → (a, d) over (b, c)
    val docs = Seq((1L, "b c"), (2L, "a d")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, "doc_id", "text", nMerges = 1).collect()
    assert(m.toSeq == Seq(Row(1L, "a_d", 1L, 3L))) // b c stays 2 tokens + [a_d]
  }

  test("bpeTrain: normalization, nulls, short docs, early exhaustion") {
    // punctuation normalizes away; null text is dropped; single-token
    // and empty docs contribute no pairs; the corpus runs out of pairs
    // after 2 merges even though 5 were requested
    val docs = Seq((1L, "Hello, WORLD! hello world"), (2L, null),
      (3L, "solo"), (4L, "  ")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, "doc_id", "text", nMerges = 5).collect()
    // pairs: (hello,world)×2, (world,hello)×1 → merge hello_world,
    // leaving [hello_world, hello_world] + solo; round 2 merges those;
    // round 3 finds no pairs (2 single-token docs) and stops
    assert(m.toSeq == Seq(
      Row(1L, "hello_world", 2L, 3L),
      Row(2L, "hello_world_hello_world", 1L, 2L)))
  }

  test("x152 multi-probe recall: residual codes make probes pay; absolute codes don't") {
    val df = graft.queries.TrainingQueries.defs("x152_multiprobe_recall")(
      spark, "/root/testdata/sf0.001")
    val rows = df.select($"scheme", $"probes", $"qid", $"n_hit")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.size == 48) // 8 queries × probes ∈ {1,2,4} × 2 schemes
    assert(rows.forall { case (_, _, _, h) => h >= 0L && h <= 10L })
    val mean = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(rs => rs.map(_._4).sum.toDouble / rs.size).toMap
    // The finding the query exists to record: with RESIDUAL codes
    // (IVFADC) widening the probe set is monotonically non-decreasing
    // on the deterministic fixture — the within-cell refinement is what
    // extra probes need. With ABSOLUTE codes it is NOT (the coarse
    // centroids double as the PQ codebook, so foreign-cell candidates
    // carry cell-scale ADC error); we only pin that the absolute curve
    // exists and stays in range, not a direction it doesn't have.
    assert(mean(("residual", 1L)) <= mean(("residual", 2L)) &&
      mean(("residual", 2L)) <= mean(("residual", 4L)),
      s"residual recall curve not monotone: $mean")
  }

  test("x154 sequence packing: stream reconstruction, bin arithmetic, per-source independence") {
    val out = graft.queries.TrainingQueries.defs("x154_sequence_packing")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"doc_id", $"n_tokens", $"stream_pos",
        $"bin_first", $"bin_last", $"bin_offset")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    val B = 512L
    out.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      // the stream is EXACTLY the concatenation: each doc's position is
      // the running sum of (tokens + separator) of every prior doc
      var pos = 0L
      sorted.foreach { case (_, id, n, sp, bf, bl, off) =>
        assert(sp == pos, s"$src/$id stream_pos $sp != reconstructed $pos")
        assert(n >= 1, s"$src/$id zero-token doc leaked into the pack")
        assert(bf == sp / B && off == sp % B && bl == (sp + n) / B,
          s"$src/$id bin arithmetic drifted")
        assert(bl >= bf, s"$src/$id bin_last < bin_first")
        pos += n + 1
      }
    }
    // cross-source independence: every source's stream starts at 0
    assert(out.groupBy(_._1).values.forall(_.map(_._4).min == 0L))

    // x155 report cross-lock: the aggregate can never drift from the
    // per-doc frame it is built on
    val rep = graft.queries.TrainingQueries.defs("x155_packing_report")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"n_docs", $"total_tokens", $"n_bins",
        $"pad_tokens", $"n_straddling", $"utilization_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep.keySet == out.map(_._1).toSet)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val (_, nd, tt, nb, pad, ns, u) = rep(src)
      assert(nd == rows.size && tt == rows.map(_._3).sum)
      val streamLen = rows.map(r => r._3 + 1).sum
      assert(nb == (streamLen + B - 1) / B && pad == nb * B - streamLen)
      assert(pad >= 0 && pad < B, s"$src pad $pad outside [0, $B)")
      assert(nb >= rows.map(_._6).max + 1, s"$src bins < max bin_last+1")
      assert(ns == rows.count(r => r._6 > r._5))
      assert(u == tt * 1000000L / (nb * B) && u <= 1000000L)
    }
  }

  test("x157 unimax: closed form == the sequential waterfill recurrence; budget conserved") {
    val out = graft.queries.TrainingQueries.defs("x157_unimax_budget")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"n_tokens", $"cap_tokens", $"budget",
        $"capped", $"alloc_tokens", $"epochs_ppm")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    val budget = out.head._4
    assert(out.forall(_._4 == budget))
    // replay the UniMax recurrence independently (Chung '23 waterfill):
    // ascending (n, source); share = floor(R / remaining);
    // alloc = min(cap, share); R -= alloc
    val asc = out.sortBy(r => (r._2, r._1))
    var r = budget
    var remaining = asc.size.toLong
    val replay = asc.map { row =>
      val cap = row._2 * 2L
      val share = r / remaining
      val alloc = math.min(cap, share)
      r -= alloc; remaining -= 1
      row._1 -> alloc
    }.toMap
    out.foreach { row =>
      assert(row._3 == row._2 * 2L, s"${row._1} cap != E*n")
      assert(row._6 == replay(row._1),
        s"${row._1} closed-form alloc ${row._6} != recurrence ${replay(row._1)}")
      assert(row._6 <= row._3, s"${row._1} alloc exceeds the epoch cap")
      assert(row._7 == (row._6 / row._2) * 1000000L
        + (row._6 % row._2) * 1000000L / row._2, s"${row._1} epochs_ppm drifted")
      assert(row._7 <= 2000000L, s"${row._1} epochs above the cap E=2")
    }
    // with any uncapped source the waterfill spends the budget EXACTLY
    if (out.exists(_._5 == 0L))
      assert(out.map(_._6).sum == budget, "budget not conserved")
    // caps bind on a prefix of the ascending order
    val cappedFlags = asc.map(_._5)
    assert(!cappedFlags.dropWhile(_ == 1L).contains(1L),
      "capped set is not an ascending-order prefix")
    // this fixture must exercise BOTH branches
    assert(out.exists(_._5 == 1L) && out.exists(_._5 == 0L),
      "fixture no longer exercises both capped and uncapped branches")
  }

  test("x160/x161: midrank AUC == brute-force pair counting; PR sweep == direct threshold counts") {
    import graft.text.TextOps
    import org.apache.spark.sql.functions._
    // the evaluator's own (qm, pos) convention, collected independently
    val toks = filter(TextOps.tokens(col("text")), w => w =!= "")
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(
        floor(TextOps.qualityScore(col("text"))
          * expr("CAST(1000000.0 AS DOUBLE)")).as("qm"),
        (size(toks) - size(array_distinct(toks)) <= 10).as("pos"))
      .as[(Long, Boolean)].collect().toSeq
    val posS = rows.filter(_._2).map(_._1)
    val negS = rows.filterNot(_._2).map(_._1)
    assert(posS.nonEmpty && negS.nonEmpty, "label is degenerate on the fixture")
    // brute-force Mann–Whitney over all pos×neg pairs
    var wins2 = 0L // 2·wins + ties
    posS.foreach(p => negS.foreach { n =>
      if (p > n) wins2 += 2 else if (p == n) wins2 += 1
    })
    val out = graft.queries.TrainingQueries.defs("x160_quality_auc")(
      spark, "/root/testdata/sf0.001")
      .select($"n_pos", $"n_neg",
        $"auc_num".cast("long"), $"auc_den".cast("long"), $"auc")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(out._1 == posS.size && out._2 == negS.size)
    // 2U = wins2 exactly; AUC = wins2 / (2·np·nn)
    assert(out._3 == wins2, s"midrank num ${out._3} != pair count $wins2")
    assert(out._4 == 2L * posS.size * negS.size)
    assert(out._5 == wins2.toDouble / (2.0 * posS.size * negS.size))
    // honest negative, pinned: on this corpus the length-driven quality
    // score is an ANTI-detector of low repetition (repetitive docs are
    // longer) — AUC far below chance, so a consumer must flip or drop it
    assert(out._5 < 0.1, s"AUC ${out._5} drifted from the pinned negative")

    // PR sweep == direct threshold counting on the same collected rows
    val sweep = graft.queries.TrainingQueries.defs("x161_quality_pr_sweep")(
      spark, "/root/testdata/sf0.001")
      .select($"tau", $"tp", $"fp", $"fn", $"tn")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(sweep.length == 21)
    sweep.foreach { case (tau, tp, fp, fn, tn) =>
      assert(tp == posS.count(_ >= tau), s"tau=$tau tp")
      assert(fp == negS.count(_ >= tau), s"tau=$tau fp")
      assert(fn == posS.count(_ < tau) && tn == negS.count(_ < tau))
    }
  }

  test("x163 gopher repetition: position coverage is an interval UNION — overlaps count once") {
    import org.apache.spark.sql.functions._
    // replay the operator's semantics on the catalog surface: for each
    // doc, mark token positions covered by any duplicated 2-/3-gram and
    // compare the exact union size against the emitted ppm
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        filter(graft.text.TextOps.tokens(col("text")), w => w =!= "")
          .as("t"))
      .as[(Long, Seq[String])].collect().toMap
    val out = graft.queries.TrainingQueries.defs("x163_gopher_repetition")(
      spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"n_tokens", $"dup2_cover_ppm", $"dup3_cover_ppm",
        $"keep")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty && out.size == docs.count(_._2.nonEmpty))
    def cover(t: Seq[String], k: Int): Long = {
      val grams = t.sliding(k).toSeq.filter(_.size == k)
      val dups = grams.groupBy(identity).filter(_._2.size >= 2).keySet
      grams.zipWithIndex.collect {
        case (g, i) if dups(g) => (i until i + k)
      }.flatten.distinct.size.toLong
    }
    out.foreach { case (id, n, p2, p3, keep) =>
      val t = docs(id)
      assert(n == t.size)
      assert(p2 == cover(t, 2) * 1000000L / n, s"doc $id dup2 drifted")
      assert(p3 == cover(t, 3) * 1000000L / n, s"doc $id dup3 drifted")
      assert(keep == (if (p2 <= 200000L && p3 <= 180000L) 1L else 0L))
    }
    // the Gopher thresholds must exercise both branches on this corpus
    assert(out.exists(_._5 == 0L) && out.exists(_._5 == 1L))
    // overlap law, pinned on a crafted doc: "a a a a" has 3 duplicated
    // (a,a) bigram occurrences over only 4 positions — occurrence
    // weighting would claim 6
    assert(cover(Seq("a", "a", "a", "a"), 2) == 4L)
  }

  test("x164 loader manifest: composition cross-lock against x163 survivors and the unimax recurrence") {
    val sf = "/root/testdata/sf0.001"
    val gop = graft.queries.TrainingQueries.defs("x163_gopher_repetition")(
      spark, sf)
      .select($"doc_id", $"n_tokens", $"keep")
      .as[(Long, Long, Long)].collect().toSeq
    // x163's catalog face drops source; recover it independently
    val srcOf = graft.Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val kept = gop.filter(_._3 == 1L).groupBy(r => srcOf(r._1))
    val out = graft.queries.TrainingQueries.defs("x164_loader_manifest")(
      spark, sf)
      .select($"source", $"n_docs_kept", $"n_docs_dropped", $"kept_tokens",
        $"alloc_tokens", $"epochs_ppm", $"bins_per_epoch")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).toSet == kept.keySet)
    // counts and masses match the survivor set exactly
    val dropped = gop.filter(_._3 == 0L).groupBy(r => srcOf(r._1))
      .view.mapValues(_.size.toLong).toMap
    out.foreach { case (src, nk, nd, tok, _, _, bins) =>
      assert(nk == kept(src).size && tok == kept(src).map(_._2).sum)
      assert(nd == dropped.getOrElse(src, 0L))
      val streamLen = kept(src).map(_._2 + 1).sum
      assert(bins == (streamLen + 511) / 512)
    }
    // allocation == the unimax recurrence over the SURVIVING masses
    val masses = out.map(r => r._1 -> r._4)
    val budget = (masses.map(_._2).sum * 9) / 5
    var rem = budget
    var cnt = masses.size.toLong
    val replay = masses.sortBy { case (g, w) => (w, g) }.map { case (g, w) =>
      val alloc = math.min(w * 2, rem / cnt)
      rem -= alloc; cnt -= 1
      g -> alloc
    }.toMap
    out.foreach { case (src, _, _, tok, alloc, ppm, _) =>
      assert(alloc == replay(src), s"$src manifest alloc drifted")
      assert(ppm == (alloc / tok) * 1000000L + (alloc % tok) * 1000000L / tok)
    }
  }

  test("x165 epoch order: seeded permutation laws + mid-epoch checkpoint resume reproduces the suffix exactly") {
    val sf = "/root/testdata/sf0.001"
    def run(): Seq[(Long, Long, String, Long, Long)] =
      graft.queries.TrainingQueries.defs("x165_epoch_order")(spark, sf)
        .select($"worker", $"step", $"source", $"bin_idx", $"order_key")
        .as[(Long, Long, String, Long, Long)].collect().toSeq
    val full = run()
    assert(full.nonEmpty)
    // steps per worker are contiguous 1..n (a total consumption order)
    full.groupBy(_._1).foreach { case (w, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq,
        s"worker $w steps not contiguous")
    }
    // the bins consumed are EXACTLY the bins x164's manifest prices:
    // same surviving sources, same bins_per_epoch, bin ids 0..n-1
    val priced = graft.queries.TrainingQueries.defs("x164_loader_manifest")(
      spark, sf).select($"source", $"bins_per_epoch")
      .as[(String, Long)].collect().toMap
    val consumed = full.groupBy(_._3).view
      .mapValues(_.map(_._4).sorted).toMap
    assert(consumed.keySet == priced.keySet,
      "epoch order consumes a different source set than the manifest prices")
    consumed.foreach { case (src, bins) =>
      assert(bins == (0L until priced(src)).toSeq,
        s"$src bins drift from the priced bins_per_epoch")
    }
    // each source lives on exactly one worker, and the order within a
    // worker is the hash order (order_key, source, bin_idx)
    assert(full.groupBy(_._3).forall(_._2.map(_._1).distinct.size == 1))
    full.groupBy(_._1).foreach { case (_, rows) =>
      val inStep = rows.sortBy(_._2).map(r => (r._5, r._3, r._4))
      assert(inStep == inStep.sorted, "step order is not the hash order")
    }
    // THE RESUME LAW: the order is a pure function of (seed, source,
    // bin), so restarting from a mid-epoch checkpoint is a step-filter —
    // an independent recomputation reproduces the suffix row-for-row
    val ckpt = full.groupBy(_._1).map { case (w, rows) =>
      w -> rows.map(_._2).max / 2
    }
    def suffix(rs: Seq[(Long, Long, String, Long, Long)]) =
      rs.filter(r => r._2 > ckpt(r._1)).sortBy(r => (r._1, r._2))
    val rerun = run()
    assert(suffix(rerun) == suffix(full),
      "mid-epoch resume did not reproduce the suffix")
  }

  test("x166 interleave audit: runs replay exactly from the collected x165 order") {
    val sf = "/root/testdata/sf0.001"
    val order = graft.queries.TrainingQueries.defs("x165_epoch_order")(
      spark, sf).select($"worker", $"step", $"source")
      .as[(Long, Long, String)].collect().toSeq
    // independent run computation: walk each worker's steps in order
    val expect = order.groupBy(_._1).toSeq.flatMap { case (w, rows) =>
      val srcs = rows.sortBy(_._2).map(_._3)
      val runs = srcs.foldLeft(List.empty[(String, Long)]) {
        case ((s, n) :: tail, cur) if s == cur => (s, n + 1) :: tail
        case (acc, cur) => (cur, 1L) :: acc
      }
      runs.groupBy(_._1).map { case (src, rs) =>
        (w, src) -> ((rs.map(_._2).sum, rs.size.toLong, rs.map(_._2).max))
      }
    }.toMap
    val got = graft.queries.TrainingQueries.defs("x166_interleave_audit")(
      spark, sf)
      .select($"worker", $"source", $"n_steps", $"n_runs", $"max_run_len")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got.size == expect.size)
    got.foreach { case (w, src, steps, runs, maxRun) =>
      assert(expect((w, src)) == ((steps, runs, maxRun)),
        s"worker $w source $src audit drifted")
    }
  }

  test("x167 step lineage: segments tile each step's bin; every kept doc's coverage is n_tokens + 1") {
    val sf = "/root/testdata/sf0.001"
    val lin = graft.queries.TrainingQueries.defs("x167_step_lineage")(
      spark, sf)
      .select($"worker", $"step", $"source", $"bin_idx", $"doc_id",
        $"seg_start", $"seg_end")
      .as[(Long, Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(lin.nonEmpty)
    // every ordered (worker, step) resolves: the step set equals x165's
    val order = graft.queries.TrainingQueries.defs("x165_epoch_order")(
      spark, sf).select($"worker", $"step", $"source", $"bin_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(lin.map(r => (r._1, r._2, r._3, r._4)).toSet ==
      order.map(r => (r._1, r._2, r._3, r._4)).toSet)
    // per (worker, step): segments tile [0, fill) contiguously
    lin.groupBy(r => (r._1, r._2)).foreach { case ((w, st), rows) =>
      val segs = rows.map(r => (r._6, r._7)).sortBy(_._1)
      assert(segs.head._1 == 0L, s"step ($w,$st) does not start at 0")
      segs.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 == s2,
          s"step ($w,$st) segments not contiguous")
        case _ => ()
      }
      assert(segs.forall { case (s, e) => s < e && e <= 512L })
    }
    // every kept doc appears with total coverage n_tokens + 1 (its text
    // plus the one separator), split across its straddled bins
    val kept = graft.queries.TrainingQueries.defs("x163_gopher_repetition")(
      spark, sf).filter($"keep" === 1L)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    val covered = lin.groupBy(_._5).view
      .mapValues(_.map(r => r._7 - r._6).sum).toMap
    assert(covered.keySet == kept.keySet)
    covered.foreach { case (doc, tot) =>
      assert(tot == kept(doc) + 1L, s"doc $doc coverage drifted")
    }
  }

  test("x168 epoch consumption: passes sum to the x164 allocation; truncated prefix replays exactly") {
    val sf = "/root/testdata/sf0.001"
    val sched = graft.queries.TrainingQueries.defs("x168_epoch_consumption")(
      spark, sf)
      .select($"source", $"epoch_idx", $"tokens_consumed", $"docs_full",
        $"stream_pos_end", $"bins_consumed")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(sched.nonEmpty)
    val manifest = graft.queries.TrainingQueries.defs("x164_loader_manifest")(
      spark, sf)
      .select($"source", $"alloc_tokens", $"bins_per_epoch", $"n_docs_kept",
        $"kept_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // Σ tokens over a source's passes == its x164 allocation, exactly
    sched.groupBy(_._1).foreach { case (src, rows) =>
      val (alloc, binsPer, nDocs, keptTok) = manifest(src)
      assert(rows.map(_._3).sum == alloc, s"$src passes do not sum to alloc")
      // epoch indices are 0..k-1; full epochs mirror x155/x164's pricing
      assert(rows.map(_._2).sorted == (0L until rows.size).toSeq)
      rows.filter(r => r._3 == keptTok).foreach { r =>
        assert(r._4 == nDocs && r._6 == binsPer,
          s"$src full epoch drifted from the manifest")
      }
      // truncated epoch (if any) is the unique non-full final pass
      val trunc = rows.filter(r => r._3 != keptTok)
      assert(trunc.size <= 1)
      trunc.foreach(r => assert(r._2 == rows.map(_._2).max))
    }
    // truncated-prefix replay from the x163 survivors: docs_full = docs
    // whose cumulative token prefix fits in rem; pos = rem + docs_full
    val kept = graft.queries.TrainingQueries.defs("x163_gopher_repetition")(
      spark, sf).filter($"keep" === 1L)
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    val srcOf = graft.Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id").isNotNull)
      .select($"doc_id", $"source").as[(Long, String)].collect().toMap
    val bySrc = kept.toSeq.groupBy(kv => srcOf(kv._1)).view
      .mapValues(_.sortBy(_._1).map(_._2)).toMap
    sched.groupBy(_._1).foreach { case (src, rows) =>
      val (_, _, _, keptTok) = manifest(src)
      rows.filter(r => r._3 != keptTok).foreach { r =>
        val rem = r._3
        val cums = bySrc(src).scanLeft(0L)(_ + _).tail
        val docsFull = cums.count(_ <= rem).toLong
        assert(r._4 == docsFull, s"$src truncated docs_full drifted")
        assert(r._5 == rem + docsFull, s"$src truncated pos drifted")
        assert(r._6 == (r._5 + 511) / 512)
      }
    }
    // both branches live on this corpus
    assert(sched.exists(r => manifest(r._1)._4 == r._3) &&
      sched.exists(r => manifest(r._1)._4 != r._3))
  }

  test("x169 mixture drift: realized tokens conserve the stream; ppm algebra exact") {
    val sf = "/root/testdata/sf0.001"
    val drift = graft.queries.TrainingQueries.defs("x169_mixture_drift")(
      spark, sf)
      .select($"window_idx", $"source", $"realized_tokens", $"realized_ppm",
        $"planned_ppm", $"drift_ppm")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(drift.nonEmpty)
    // conservation: every stream position is consumed exactly once, so
    // per-source realized tokens across all windows == its stream_len
    val masses = graft.queries.TrainingQueries.defs("x164_loader_manifest")(
      spark, sf).select($"source", $"n_docs_kept", $"kept_tokens")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._3 + r._2)).toMap // stream_len = tokens + docs
    val realized = drift.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(realized.keySet == masses.keySet)
    realized.foreach { case (src, tot) =>
      assert(tot == masses(src), s"$src realized tokens drifted")
    }
    // windows are contiguous from 0; each window's shares floor-sum to
    // ≤ 1e6 and the signed drift column is exactly realized − planned
    assert(drift.map(_._1).distinct.sorted ==
      (0L to drift.map(_._1).max).toSeq)
    drift.groupBy(_._1).foreach { case (w, rows) =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size,
        s"window $w shares do not floor-sum to 1e6")
    }
    drift.foreach { case (_, _, _, rp, pp, dp) => assert(dp == rp - pp) }
  }

  test("x170 multi-epoch order: epochs concatenate per x168's passes; resume crosses an epoch boundary") {
    val sf = "/root/testdata/sf0.001"
    def run(): Seq[(Long, Long, Long, String, Long, Long)] =
      graft.queries.TrainingQueries.defs("x170_multiepoch_order")(spark, sf)
        .select($"worker", $"step", $"epoch_idx", $"source", $"bin_idx",
          $"order_key")
        .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    val full = run()
    assert(full.nonEmpty)
    // the corpus exercises multiple epochs (UniMax's 1.8x budget forces
    // capped 2x sources into epoch 1) — otherwise the boundary law below
    // is vacuous
    assert(full.exists(_._3 > 0L), "no multi-epoch source on this corpus")
    // steps per worker are contiguous 1..n, and every epoch-e step
    // precedes every epoch-(e+1) step (epochs CONCATENATE)
    full.groupBy(_._1).foreach { case (w, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq,
        s"worker $w steps not contiguous")
      val byStep = rows.sortBy(_._2)
      assert(byStep.map(_._3) == byStep.map(_._3).sorted,
        s"worker $w interleaves epochs")
      // within a worker, step order is the (epoch, hash) order
      val key = byStep.map(r => (r._3, r._6, r._4, r._5))
      assert(key == key.sorted, s"worker $w step order is not hash order")
    }
    // per (source, epoch): the bin set is EXACTLY x168's consumed prefix
    val sched = graft.queries.TrainingQueries.defs("x168_epoch_consumption")(
      spark, sf).select($"source", $"epoch_idx", $"bins_consumed")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val got = full.groupBy(r => (r._4, r._3)).view
      .mapValues(_.map(_._5).sorted).toMap
    assert(got.keySet == sched.keySet,
      "order consumes different (source, epoch) passes than x168")
    got.foreach { case (k, bins) =>
      assert(bins == (0L until sched(k)).toSeq, s"$k bins drift from x168")
    }
    // epoch 0 replays x165's seed bit-for-bit: same (source, bin) →
    // same order_key (x165 orders FULL epochs, so compare on the
    // intersection — a truncated epoch 0 is a prefix of x165's bins)
    val ep1Keys = graft.queries.TrainingQueries.defs("x165_epoch_order")(
      spark, sf).select($"source", $"bin_idx", $"order_key")
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    full.filter(_._3 == 0L).foreach { r =>
      assert(ep1Keys((r._4, r._5)) == r._6,
        s"epoch-0 key for (${r._4}, ${r._5}) drifts from x165's ep1 seed")
    }
    // THE BOUNDARY-CROSSING RESUME LAW: checkpoint one step BEFORE each
    // worker's last epoch-0 step, so the replayed suffix contains the
    // tail of epoch 0 AND every later epoch — an independent
    // recomputation reproduces it row-for-row (the order is a pure
    // function of (epoch seed, source, bin), never of run state)
    val ckpt = full.groupBy(_._1).map { case (w, rows) =>
      val ep0 = rows.filter(_._3 == 0L).map(_._2)
      w -> (if (ep0.nonEmpty) ep0.max - 1 else 0L)
    }
    // the law must actually cross: some worker's suffix spans 2+ epochs
    assert(full.exists(r => r._2 > ckpt(r._1) && r._3 > 0L) &&
      full.exists(r => r._2 > ckpt(r._1) && r._3 == 0L),
      "checkpoint does not cross an epoch boundary on this corpus")
    def suffix(rs: Seq[(Long, Long, Long, String, Long, Long)]) =
      rs.filter(r => r._2 > ckpt(r._1)).sortBy(r => (r._1, r._2))
    val rerun = run()
    assert(suffix(rerun) == suffix(full),
      "epoch-boundary resume did not reproduce the suffix")
  }

  test("x171 elastic rescale: conserves the x170 suffix exactly; order survives the fleet resize") {
    val sf = "/root/testdata/sf0.001"
    val full = graft.queries.TrainingQueries.defs("x170_multiepoch_order")(
      spark, sf)
      .select($"worker", $"step", $"epoch_idx", $"source", $"bin_idx",
        $"order_key")
      .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    def run(): Seq[(Long, Long, Long, String, Long, Long)] =
      graft.queries.TrainingQueries.defs("x171_elastic_rescale")(spark, sf)
        .select($"worker", $"step", $"epoch_idx", $"source", $"bin_idx",
          $"order_key")
        .as[(Long, Long, Long, String, Long, Long)].collect().toSeq
    val res = run()
    assert(res.nonEmpty)
    // CONSERVATION: the rescaled rows are EXACTLY x170's post-checkpoint
    // suffix — same (epoch, source, bin, key) multiset, nothing lost or
    // re-consumed when the fleet resizes
    val want = full.filter(_._2 > 4L).map(r => (r._3, r._4, r._5, r._6))
    assert(res.map(r => (r._3, r._4, r._5, r._6)).sorted == want.sorted,
      "rescale does not conserve the x170 suffix")
    // new fleet: workers 0..11 only, steps contiguous per worker, and
    // the within-worker order is still the seeded (epoch, hash) order
    assert(res.map(_._1).forall(w => w >= 0L && w < 12L))
    res.groupBy(_._1).foreach { case (w, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq,
        s"worker $w steps not contiguous after rescale")
      val key = rows.sortBy(_._2).map(r => (r._3, r._6, r._4, r._5))
      assert(key == key.sorted, s"worker $w lost the seeded order")
    }
    // a source lives on ONE new worker (placement is per-source)
    assert(res.groupBy(_._4).forall(_._2.map(_._1).distinct.size == 1))
    // pure function: an independent recomputation is identical
    assert(run().sortBy(r => (r._1, r._2)) == res.sortBy(r => (r._1, r._2)),
      "rescale is not replayable")
  }

  test("x172 curriculum mixture: phase 0 is the natural mixture, phase 3 the quality mixture; anneal is linear") {
    val sf = "/root/testdata/sf0.001"
    val cur = graft.queries.TrainingQueries.defs("x172_curriculum_mixture")(
      spark, sf)
      .select($"phase_idx", $"source", $"nat_ppm", $"qual_ppm", $"share_ppm")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(cur.nonEmpty)
    assert(cur.map(_._1).distinct.sorted == Seq(0L, 1L, 2L, 3L))
    cur.foreach { case (p, src, nat, qual, share) =>
      assert(share == ((3 - p) * nat + p * qual) / 3,
        s"phase $p $src share is not the linear anneal")
      if (p == 0L) assert(share == nat, s"$src phase 0 is not natural")
      if (p == 3L) assert(share == qual, s"$src phase 3 is not quality")
    }
    // each phase's floor shares sum to ≤ 1e6 with bounded slack
    cur.groupBy(_._1).foreach { case (p, rows) =>
      val s = rows.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - 3 * rows.size,
        s"phase $p shares do not floor-sum toward 1e6 ($s)")
    }
    // the mixtures genuinely differ on this corpus (the anneal moves)
    assert(cur.exists(r => r._3 != r._4), "natural == quality everywhere")
  }

  test("x173 shard checksums: every x167 step signed, replayable, segment counts conserved") {
    val sf = "/root/testdata/sf0.001"
    def run(): Seq[(Long, Long, Long, Long)] =
      graft.queries.TrainingQueries.defs("x173_shard_checksums")(spark, sf)
        .select($"worker", $"step", $"n_segs", $"checksum")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val cs = run()
    assert(cs.nonEmpty)
    val lin = graft.queries.TrainingQueries.defs("x167_step_lineage")(
      spark, sf).select($"worker", $"step")
      .as[(Long, Long)].collect().toSeq
    // one manifest row per lineage step; n_segs counts its segments
    val wantCounts = lin.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(cs.map(r => (r._1, r._2)).toSet == wantCounts.keySet)
    cs.foreach { case (w, st, n, _) =>
      assert(n == wantCounts((w, st)), s"($w,$st) n_segs drifted")
    }
    // signatures are 48-bit sums: positive, bounded by n_segs·2^48
    cs.foreach { case (w, st, n, sum) =>
      assert(sum >= 0L && sum <= n * (1L << 48),
        s"($w,$st) checksum outside the 48-bit sum range")
    }
    // replayable: an independent recomputation signs identically
    assert(run().sorted == cs.sorted, "checksums are not replayable")
  }

  test("x174 dress rehearsal: conservation laws hold on real data; roll-ups cross-lock the standalone stages") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.TrainingQueries.defs("x174_loader_rehearsal")(
      spark, sf)
      .select($"source", $"n_docs_kept", $"stream_len", $"bins_per_epoch",
        $"n_steps", $"lineage_positions", $"alloc_tokens",
        $"consumed_tokens", $"order_ok", $"pack_ok", $"consume_ok")
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Boolean, Boolean, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    // THE conservation laws: on real data every interface reconciles —
    // order serves exactly the priced bins, the lineage tiles the
    // stream position-for-position, consumption spends exactly the
    // UniMax allocation. A false here means two loader stages disagree
    // about the same stream.
    rows.foreach { case (src, _, sl, bins, steps, linPos, alloc, cons,
        oOk, pOk, cOk) =>
      assert(oOk && pOk && cOk, s"$src: conservation law broken " +
        s"(order=$oOk pack=$pOk consume=$cOk)")
      assert(steps == bins && linPos == sl && cons == alloc)
    }
    // cross-lock against the STANDALONE stages (same sf, independent
    // plans): x165's per-source step counts and x168's consumed sums
    val stepCounts = graft.queries.TrainingQueries.defs("x165_epoch_order")(
        spark, sf).select($"source").as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val consSums = graft.queries.TrainingQueries.defs("x168_epoch_consumption")(
        spark, sf).select($"source", $"tokens_consumed")
      .as[(String, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    rows.foreach { case (src, _, _, _, steps, _, _, cons, _, _, _) =>
      assert(stepCounts(src) == steps, s"$src: x165 step count drifted")
      assert(consSums.getOrElse(src, 0L) == cons,
        s"$src: x168 consumption drifted")
    }
  }

  test("x159 attention boundaries: per-bin segments tile [0, fill) contiguously; straddlers split exactly") {
    val segs = graft.queries.TrainingQueries.defs("x159_attention_boundaries")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"bin_idx", $"doc_id", $"seg_start", $"seg_end")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(segs.nonEmpty)
    val packed = graft.queries.TrainingQueries.defs("x154_sequence_packing")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"doc_id", $"n_tokens", $"stream_pos",
        $"bin_first", $"bin_last")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // every packed doc appears in exactly (bin_last - bin_first + 1)
    // bins, and its per-bin segment lengths sum to n_tokens + 1
    val byDoc = segs.groupBy(s => (s._1, s._3))
    packed.foreach { case (src, id, n, _, bf, bl) =>
      val mine = byDoc((src, id))
      assert(mine.size == (bl - bf + 1),
        s"$src/$id appears in ${mine.size} bins, expected ${bl - bf + 1}")
      assert(mine.map(s => s._5 - s._4).sum == n + 1,
        s"$src/$id segment lengths don't sum to tokens + separator")
      assert(mine.map(_._2).toSet == (bf to bl).toSet)
    }
    // cu_seqlens contract per bin: sorted segments are contiguous from 0
    // (the first segment starts at 0 — a straddler's tail or a doc start)
    segs.groupBy(s => (s._1, s._2)).foreach { case ((src, bin), items) =>
      val sorted = items.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"$src bin $bin doesn't start at 0")
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5 == b._4, s"$src bin $bin gap at ${a._5}")
        case _ =>
      }
      assert(sorted.last._5 <= 512L)
      assert(sorted.forall(s => s._4 < s._5), s"$src bin $bin empty segment")
    }
    // segment ends are the cu_seqlens the loader gathers: for every
    // NON-final bin of a source the tiling reaches exactly 512
    val lastBin = segs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    segs.groupBy(s => (s._1, s._2)).foreach { case ((src, bin), items) =>
      if (bin < lastBin(src))
        assert(items.map(_._5).max == 512L,
          s"$src bin $bin (non-final) not fully tiled")
    }
  }
}
