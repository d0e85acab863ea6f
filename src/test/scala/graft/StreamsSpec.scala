package graft

import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // stopQuietly now lives in SparkSpec (r12 verdict #1) — shared with
  // every streaming suite so no teardown window is outside the discipline.

  test("file-source stream: checkpoint restart resumes offsets, exactly-once output") {
    // the crash-recovery posture: a file drop is ingested by one query
    // incarnation, the process "dies" (query stops), a NEW incarnation on
    // the same checkpoint picks up ONLY unseen files, and the parquet
    // sink's _spark_metadata log keeps replays from double-writing
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    new java.io.File(inDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def drop(name: String, rows: (Long, String)*): Unit =
      rows.toSeq.toDF("k", "v").coalesce(1).write.parquet(s"$inDir/$name")
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(inDir)
        .filter(col("k") >= 0)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      assert(!q.isActive, "AvailableNow query failed to drain and stop")
    }
    drop("b1", (1L, "a"), (2L, "b"))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 2)
    drop("b2", (3L, "c"))
    runOnce() // new incarnation, same checkpoint: only b2 is new
    val got = spark.read.parquet(outDir).as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"restart reprocessed or dropped rows: $got")
    runOnce() // third incarnation, nothing new: output unchanged
    assert(spark.read.parquet(outDir).count() == 3)
  }

  test("sessionize splits on gap, counts sessions per key") {
    val ev = Seq(
      (1L, "u1", ts(0)), (2L, "u1", ts(100)), (3L, "u1", ts(5000)),
      (4L, "u2", ts(0)))
      .toDF("event_id", "user_id", "ts")
    val out = Streams.sessionize(ev, "user_id", "ts", gapSeconds = 1800)
      .select("event_id", "session_id").orderBy("event_id")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("tumblingAgg groups into aligned windows") {
    val ev = Seq(
      ("a", ts(10), 1.0), ("a", ts(3590), 2.0), ("a", ts(3610), 3.0))
      .toDF("event_type", "ts", "value")
    val out = Streams.tumblingAgg(ev, "ts", "1 hour", Seq("event_type"),
        Seq(count(lit(1)).as("n")))
      .select("window_start", "n").orderBy("window_start")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (3600L, 1L)))
  }

  test("newerThan filters strictly after watermark") {
    val ev = Seq((1L, ts(100)), (2L, ts(200))).toDF("id", "ts")
    val out = Streams.newerThan(ev, "ts", lit(ts(100)))
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(2L))
  }

  test("upsertEachBatch: micro-batches merge idempotently into parquet") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_upsert")
      .toString + "/target"
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("k", "v")
    val q = Streams.upsertEachBatch(df.writeStream, dir, Seq("k"))
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "b2"), (3L, "c")) // update + insert
      q.processAllAvailable()
      val got = spark.read.parquet(dir).orderBy("k")
        .as[(Long, String)].collect().toSeq
      assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    } finally stopQuietly(q)
  }

  test("streamingFirstSeen: custom state dedups keys across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("key", "v")
    val out = Streams.streamingFirstSeen(df, "key")
    val q = out.writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      mem.addData(("a", 1), ("b", 2))
      q.processAllAvailable()
      mem.addData(("a", 99), ("c", 3)) // a is a redelivery, c is new
      q.processAllAvailable()
      val rows = spark.table("first_seen")
        .as[(String, Int)].collect().sorted.toSeq
      assert(rows == Seq(("a", 1), ("b", 2), ("c", 3)))
    } finally stopQuietly(q)
  }

  test("streamingContaminationFlags: winnow probe flags contaminated docs per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val leak = "this exact benchmark sentence must never appear in training data"
    val bench = Seq((1000L, s"benchmark prompt alpha. $leak. benchmark answer omega"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.Streams.streamingContaminationFlags(
      mem.toDF().toDF("doc_id", "text"), bench, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("contam_flags")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, s"ordinary clean document with plenty of unrelated words in it"),
        (2L, s"a crawler page quoting: $leak — should be flagged"))
      q.processAllAvailable()
      mem.addData(
        (2L, s"a crawler page quoting: $leak — should be flagged"), // redelivery
        (3L, s"another clean doc, long enough to have anchors of its own here"))
      q.processAllAvailable()
      val flagged = spark.table("contam_flags").as[Long].collect().sorted.toSeq
      assert(flagged == Seq(2L))
    } finally stopQuietly(q)
  }

  test("streamingContaminationFlags (watermarked): state-evicting form still dedups in-window redeliveries") {
    implicit val sqlCtx = spark.sqlContext
    val leak = "this exact benchmark sentence must never appear in training data"
    val bench = Seq((1000L, s"benchmark prompt alpha. $leak. benchmark answer omega"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = graft.streaming.Streams.streamingContaminationFlags(
      mem.toDF().toDF("ts", "doc_id", "text"), bench, "doc_id", "text",
      "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("contam_flags_wm")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(10000), 1L, "ordinary clean document with plenty of unrelated words in it"),
        (ts(10010), 2L, s"a crawler page quoting: $leak — should be flagged"))
      q.processAllAvailable()
      mem.addData( // in-window redelivery: collapses into the standing state
        (ts(10060), 2L, s"a crawler page quoting: $leak — should be flagged"),
        (ts(10070), 3L, "another clean doc, long enough to have anchors of its own here"))
      q.processAllAvailable()
      val flagged = spark.table("contam_flags_wm")
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(flagged == Seq(2L))
    } finally stopQuietly(q)
  }

  test("streamingIncrementalDedup: stream output ≡ the x49 batch chain per micro-batch, redelivery-safe") {
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.Dedup
    import graft.text.TextOps
    val dir = java.nio.file.Files.createTempDirectory("inc_dedup").toString
    val (indexDir, outPath) = (s"$dir/index", s"$dir/out")
    // corpus: docs 0-9 seed the standing index; batches arrive as new docs
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 10).select($"doc_id", $"text")
    Streams.seedDedupIndex(corpus, "doc_id", "text", indexDir)
    val base = corpus.as[(Long, String)].collect().toMap
    // batch 1: an exact dup of doc 3, a near-dup of doc 5 (one word
    // changed), and a fresh doc; batch 2: exact dup of a BATCH-1 doc
    // (the growing-index property x49's one-shot form cannot see)
    val b1 = Seq(
      (100L, base(3L)),
      (101L, base(5L).replaceFirst("\\w+", "zzz")),
      (102L, "a genuinely novel document with words shared by nobody else here"))
    val b2 = Seq(
      (200L, b1(2)._2), // exact dup of 102 — only the grown index flags it
      (201L, "another entirely fresh document nothing like the others at all"))
    val mem = MemoryStream[(Long, String)]
    val q = Streams.streamingIncrementalDedup(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", indexDir, outPath)
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b1.head, b2.head) // pure redelivery micro-batch
      q.processAllAvailable()
    } finally stopQuietly(q)
    val got = spark.read.parquet(outPath)
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq

    // batch-mode reference: the x49 operator chain applied increment by
    // increment against the SAME growing corpus (corpus, then corpus+b1)
    def x49Step(newDocs: Seq[(Long, String)],
                standing: org.apache.spark.sql.DataFrame) = {
      val nd = newDocs.toDF("doc_id", "text")
      val all = standing.unionByName(nd)
      val fpAll = all.select($"doc_id", TextOps.fingerprint($"text").as("fp"))
      val isBatch = $"doc_id".isin(newDocs.map(_._1): _*)
      val fpCorpus = fpAll.filter(!isBatch).select($"fp").distinct()
        .withColumn("__e", lit(true))
      val exact = fpAll.filter(isBatch)
        .join(org.apache.spark.sql.functions.broadcast(fpCorpus), Seq("fp"), "left")
        .select($"doc_id", coalesce($"__e", lit(false)).as("exact_dup"))
      val sh = TextOps.shingleRows(all, "doc_id", "text", 2).cache()
      val signed = Dedup.signatureOfShingles(sh, "doc_id", 12).cache()
      val cands = Dedup.lshPairsBetween(
          signed.filter(isBatch),
          signed.filter(!isBatch), "doc_id", 12, 3, 0.25)
        .select($"id_a", $"id_b")
      val near = Dedup.jaccardForShingles(sh, "doc_id", cands)
        .filter($"jaccard" >= 0.2).select($"id_a".as("doc_id")).distinct()
        .withColumn("__n", lit(true))
      exact.join(near, Seq("doc_id"), "left")
        .select($"doc_id", $"exact_dup",
          coalesce($"__n", lit(false)).as("near_dup"))
        .withColumn("accept", !$"exact_dup" && !$"near_dup")
        .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    }
    val ref1 = x49Step(b1, corpus)
    spark.catalog.clearCache()
    val ref2 = x49Step(b2, corpus.unionByName(
      b1.toDF("doc_id", "text")))
    spark.catalog.clearCache()
    assert(got == (ref1 ++ ref2).sortBy(_._1),
      s"stream $got != batch chain ${(ref1 ++ ref2).sortBy(_._1)}")
    // semantic spot checks + redelivery: 5 verdicts total (no re-emits),
    // exact dup of corpus, near dup of corpus, exact dup of a b1 doc
    assert(got.map(_._1) == Seq(100L, 101L, 102L, 200L, 201L))
    assert(got == Seq(
      (100L, true, true, false),  // exact copy is also a trivial near-dup
      (101L, false, true, false), // one word off doc 5
      (102L, false, false, true),
      (200L, true, true, false),  // dup of 102 — caught only by the grown index
      (201L, false, false, true)))
    // the redelivered docs appended nothing: one fp row per distinct doc
    val fpIds = spark.read.parquet(s"$indexDir/fps")
      .groupBy($"doc_id").count().filter($"count" > 1).count()
    assert(fpIds == 0)
  }

  test("streamingDedupWithinWatermark: in-window duplicates collapse to first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "k", "v")
    val out = Streams.streamingDedupWithinWatermark(df, "ts", "10 minutes", Seq("k"))
    val q = out.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      // NOTE the contract: ONE survivor per key within the watermark
      // window — which duplicate survives inside a single micro-batch is
      // not ordered, so duplicates here arrive in later batches. Times sit
      // above epoch 0: the initial watermark IS 0, and an event at exactly
      // 0 would be dropped as late before any state exists.
      mem.addData((ts(10000), 1L, "a"), (ts(10010), 2L, "b"))
      q.processAllAvailable()
      mem.addData((ts(10060), 1L, "a-redeliver")) // same key, still in window
      q.processAllAvailable()
      val rows = spark.table("wm_dedup").select($"k", $"v")
        .orderBy("k").as[(Long, String)].collect().toSeq
      assert(rows == Seq((1L, "a"), (2L, "b")))
    } finally stopQuietly(q)
  }

  test("streamingSessionize: append mode emits only CLOSED sessions as the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "user_id")
    val agg = Streams.streamingSessionize(df, "user_id", "ts",
      gap = "30 minutes", watermarkDelay = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("st_sessions")
      .outputMode("append").start()
    try {
      def emitted() = spark.table("st_sessions")
        .select($"user_id", $"session_start", $"n_events")
        .orderBy("user_id", "session_start")
        .as[(String, Long, Long)].collect().toSeq
      // batch 1: u1 session [0,1900), u2 session [0,1800) — all still open
      mem.addData((ts(0), "u1"), (ts(100), "u1"), (ts(0), "u2"))
      q.processAllAvailable()
      assert(emitted().isEmpty) // watermark hasn't passed any session end
      // batch 2 opens a new u1 session at 5000 and (as of the NEXT batch)
      // advances the watermark to 5000-600=4400
      mem.addData((ts(5000), "u1"))
      q.processAllAvailable()
      // batch 3: watermark 4400 closes both early sessions; the open
      // [5000, 6800) session must be withheld
      mem.addData((ts(5100), "u2"))
      q.processAllAvailable()
      assert(emitted() == Seq(("u1", 0L, 2L), ("u2", 0L, 1L)))
    } finally stopQuietly(q)
  }

  test("streamingIntervalJoin matches clicks to impressions within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, String, Long)]
    val clicks = MemoryStream[(Timestamp, String, Long)]
    val out = Streams.streamingIntervalJoin(
      imps.toDF().toDF("its", "ikey", "imp_id"), "its", "ikey",
      clicks.toDF().toDF("cts", "ckey", "click_id"), "cts", "ckey",
      watermarkDelay = "10 minutes", maxDelay = "10 minutes")
    val q = out.select($"imp_id", $"click_id")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      imps.addData((ts(1000), "u1", 1L), (ts(1000), "u2", 2L))
      clicks.addData(
        (ts(1300), "u1", 10L), // within 10 min of imp 1 → match
        (ts(2000), "u2", 20L), // 1000s later → outside the window
        (ts(1100), "u3", 30L)) // no impression for the key
      q.processAllAvailable()
      val rows = spark.table("attrib").as[(Long, Long)].collect().toSeq
      assert(rows == Seq((1L, 10L)))
    } finally stopQuietly(q)
  }

  test("streamingRunningTotals: transformWithState keeps per-key totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the
    // provider to this query (read at stream start, so restoring after
    // start() leaves the other tests on the default provider)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val out = Streams.streamingRunningTotals(
      mem.toDF().toDF("k", "cents"), "k", "cents")
    val q = out.toDF("k", "n", "cents")
      .writeStream.format("memory").queryName("tws_totals")
      .outputMode("update").start()
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      mem.addData(("a", 100L), ("a", 50L), ("b", 10L))
      q.processAllAvailable()
      mem.addData(("a", 25L)) // state must carry 150 over from batch 1
      q.processAllAvailable()
      val latest = spark.table("tws_totals")
        .groupBy($"k").agg(max(struct($"n", $"cents")).as("m"))
        .select($"k", $"m.n", $"m.cents").orderBy("k")
        .as[(String, Long, Long)].collect().toSeq
      assert(latest == Seq(("a", 3L, 175L), ("b", 1L, 10L)))
    } finally stopQuietly(q)
  }

  test("streamingTopK maintains a bounded per-group leaderboard across batches") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, String, Long)]
    val out = Streams.streamingTopK(
      mem.toDF().toDF("g", "id", "score"), "g", "id", "score", k = 2)
    val q = out.toDF("g", "id", "score", "rank")
      .writeStream.format("memory").queryName("tws_topk")
      .outputMode("update").start()
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      mem.addData(("g1", "a", 5L), ("g1", "b", 9L), ("g1", "c", 1L))
      q.processAllAvailable()
      // batch 2: a re-scored item (a→12 takes rank 1) and a new group
      mem.addData(("g1", "a", 12L), ("g2", "z", 3L))
      q.processAllAvailable()
      val latest = spark.table("tws_topk")
        .groupBy($"g", $"id")
        .agg(max(struct($"score", $"rank")).as("m"))
        .select($"g", $"id", $"m.score", $"m.rank")
        .as[(String, String, Long, Int)].collect().toSet
      // g1's final leaderboard: a=12 (rank 1), b=9 (rank 2); c fell out of
      // k=2 in batch 1 already. The memory sink's history also holds
      // batch-1 ranks — max(struct) picks each item's final emission
      val finalG1 = latest.filter(t => t._1 == "g1" && (t._2 == "a" || t._2 == "b"))
      assert(finalG1 == Set(("g1", "a", 12L, 1), ("g1", "b", 9L, 2)))
      assert(latest.contains(("g2", "z", 3L, 1)))
      // bounded state: no emission ever exceeded rank k
      assert(spark.table("tws_topk").agg(max($"rank")).as[Int].head() <= 2)
    } finally stopQuietly(q)
  }

  test("streamingPackingOffsets ≡ batch x154 positions over the same increments; redelivery and empty docs no-op") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long, Long)]
    val out = Streams.streamingPackingOffsets(
      mem.toDF().toDF("source", "doc_id", "n_tokens"),
      "source", "doc_id", "n_tokens")
    val q = out.toDF("source", "doc_id", "n_tokens", "stream_pos")
      .writeStream.format("memory").queryName("tws_pack")
      .outputMode("append").start()
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      // batch 1: two sources, out-of-order WITHIN the batch (sorted by
      // the processor), one zero-token doc that must consume nothing
      mem.addData(("a", 2L, 7L), ("a", 1L, 3L), ("b", 1L, 5L), ("a", 3L, 0L))
      q.processAllAvailable()
      // batch 2: continuation + a pure redelivery of (a, 2)
      mem.addData(("a", 4L, 2L), ("a", 2L, 7L), ("b", 2L, 1L))
      q.processAllAvailable()
      val got = spark.table("tws_pack")
        .as[(String, Long, Long, Long)].collect().toSet
      // batch x154 semantics over the union of all delivered rows: per
      // source in doc_id order, exclusive running sum of (tokens + 1)
      val expected = Set(
        ("a", 1L, 3L, 0L),  // stream: [0,2] + sep at 3
        ("a", 2L, 7L, 4L),  // [4,10] + sep at 11
        ("a", 4L, 2L, 12L), // doc 3 had 0 tokens — skipped, no position
        ("b", 1L, 5L, 0L),
        ("b", 2L, 1L, 6L))
      assert(got == expected, s"stream drifted from batch packing: $got")
      // exactly-once: the redelivered (a, 2) emitted exactly once
      assert(spark.table("tws_pack").count() == 5)
    } finally stopQuietly(q)
  }

  test("streamingNextFitPacking ≡ batch x156 scan over the same increments; redelivery and oversize handled") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long, Long)]
    val out = Streams.streamingNextFitPacking(
      mem.toDF().toDF("source", "doc_id", "n_tokens"),
      "source", "doc_id", "n_tokens", capacity = 10L)
    val q = out.toDF("source", "doc_id", "n_tokens", "bin_idx", "bin_offset")
      .writeStream.format("memory").queryName("tws_nextfit")
      .outputMode("append").start()
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      // batch 1: out-of-order within the batch; a zero-token doc; the
      // open bin for "a" ends the batch at fill 9
      mem.addData(("a", 2L, 5L), ("a", 1L, 4L), ("b", 1L, 3L), ("a", 3L, 0L))
      q.processAllAvailable()
      // batch 2: (a, 4) does NOT fit the carried fill 9 → new bin; an
      // OVERSIZED doc owns its bin; plus a pure redelivery of (a, 2)
      mem.addData(("a", 4L, 2L), ("a", 2L, 5L), ("a", 5L, 25L), ("b", 2L, 7L))
      q.processAllAvailable()
      val got = spark.table("tws_nextfit")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        ("a", 1L, 4L, 0L, 0L),
        ("a", 2L, 5L, 0L, 4L),   // fill 9 carried ACROSS the batch gap
        ("a", 4L, 2L, 1L, 0L),   // 9 + 2 > 10 → next bin
        ("a", 5L, 25L, 2L, 0L),  // oversized: own bin, offset 0
        ("b", 1L, 3L, 0L, 0L),
        ("b", 2L, 7L, 0L, 3L)), s"stream drifted from batch next-fit: $got")
      // stream ≡ the batch scan over the union of delivered rows
      val batch = graft.ops.Packing.nextFitPack(
        Seq(("a", 1L, 4L), ("a", 2L, 5L), ("a", 4L, 2L), ("a", 5L, 25L),
          ("b", 1L, 3L), ("b", 2L, 7L)).toDF("source", "doc_id", "n_tokens"),
        "source", "doc_id", "n_tokens", capacity = 10L)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got == batch)
      // exactly-once: the redelivered (a, 2) emitted exactly once
      assert(spark.table("tws_nextfit").count() == 6)
    } finally stopQuietly(q)
  }

  test("streamingRunningTotals with a TTL starts and accumulates (processing-time mode)") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val out = Streams.streamingRunningTotals(
      mem.toDF().toDF("k", "cents"), "k", "cents",
      ttl = Some(java.time.Duration.ofHours(1)))
    val q = out.toDF("k", "n", "cents")
      .writeStream.format("memory").queryName("tws_ttl")
      .outputMode("update").start()
    // NOTE: processing-time mode schedules continuous batches for TTL
    // eviction, so processAllAvailable never settles — poll the sink with
    // a deadline instead
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis + 90000
      while (spark.table("tws_ttl").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(spark.table("tws_ttl").count() >= n, s"timed out waiting for $n rows")
    }
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      mem.addData(("a", 5L))
      awaitRows(1)
      mem.addData(("a", 7L)) // well inside the TTL → state persists
      awaitRows(2)
      val latest = spark.table("tws_ttl")
        .groupBy($"k").agg(max(struct($"n", $"cents")).as("m"))
        .select($"k", $"m.n", $"m.cents")
        .as[(String, Long, Long)].collect().toSeq
      assert(latest == Seq(("a", 2L, 12L)))
    } finally stopQuietly(q)
  }

  test("streamingRunningTotalsFrom seeds batch state, stream continues it") {
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    // historical backfill: a batch aggregate of the pre-stream corpus
    val initial = Seq(("a", 10L, 1000L), ("b", 2L, 40L))
      .toDF("k", "n", "cents")
    val out = Streams.streamingRunningTotalsFrom(
      mem.toDF().toDF("k", "cents"), "k", "cents", initial)
    val q = out.toDF("k", "n", "cents")
      .writeStream.format("memory").queryName("tws_init")
      .outputMode("update").start()
    try {
      prior.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
      mem.addData(("a", 5L), ("c", 7L)) // a continues backfill; c is fresh
      q.processAllAvailable()
      val latest = spark.table("tws_init")
        .groupBy($"k").agg(max(struct($"n", $"cents")).as("m"))
        .select($"k", $"m.n", $"m.cents").orderBy("k")
        .as[(String, Long, Long)].collect().toSeq
      // b got no stream rows → no emission; a = 10+1 events, 1000+5 cents
      assert(latest == Seq(("a", 11L, 1005L), ("c", 1L, 7L)))
    } finally stopQuietly(q)
  }

  test("TopK aggregator runs as a streaming aggregation with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val top = graft.ops.TopK.topK(2)
    val agg = mem.toDF().toDF("grp", "score", "id")
      .groupBy($"grp").agg(top($"score", $"id").as("tk"))
      .select($"grp", $"tk.items")
    val q = agg.writeStream.format("memory").queryName("tws_topk")
      .outputMode("complete").start()
    try {
      mem.addData(("g", 5L, "a"), ("g", 3L, "b"), ("g", 9L, "c"))
      q.processAllAvailable()
      mem.addData(("g", 7L, "d")) // displaces b from the top-2
      q.processAllAvailable()
      val items = spark.table("tws_topk")
        .selectExpr("transform(items, x -> x.id) AS ids")
        .as[Seq[String]].collect().head
      assert(items == Seq("c", "d"))
    } finally stopQuietly(q)
  }

  test("streamingTumbling produces windowed counts under watermark (MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.streamingTumbling(df, "ts", "1 hour", "10 minutes", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("st_tumbling")
      .outputMode("complete").start()
    try {
      mem.addData((ts(10), "a", 1.0), (ts(20), "a", 2.0), (ts(3700), "b", 3.0))
      q.processAllAvailable()
      val rows = spark.table("st_tumbling")
        .select($"event_type", $"n", $"sum_value").orderBy("event_type")
        .as[(String, Long, Double)].collect().toSeq
      assert(rows == Seq(("a", 2L, 3.0), ("b", 1L, 3.0)))
    } finally stopQuietly(q)
  }

  test("streamingSliding fans events into width/slide overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    // 10-minute windows sliding by 5: an event covers exactly 2 windows
    val agg = Streams.streamingSliding(df, "ts", "10 minutes", "5 minutes",
      "5 minutes", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("st_sliding")
      .outputMode("complete").start()
    try {
      // t=360s sits in windows [0,600) and [300,900);
      // t=660s in [300,900) and [600,1200)
      mem.addData((ts(360), "a", 1.0), (ts(660), "a", 2.0))
      q.processAllAvailable()
      val rows = spark.table("st_sliding")
        .select(unix_timestamp($"w.start").as("ws"), $"n", $"sum_value")
        .orderBy("ws").as[(Long, Long, Double)].collect().toSeq
      assert(rows == Seq((0L, 1L, 1.0), (300L, 2L, 3.0), (600L, 1L, 2.0)))
    } finally stopQuietly(q)
  }

  test("streamingAnnMaintenance: incrementally-built index ≡ batch ivfTopK, redelivery-safe") {
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.Similarity
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    val (indexDir, outPath) = (s"$dir/index", s"$dir/out")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding")
    // seed = 3/4 of the corpus; model = frozen data picks FROM THE SEED
    val seed = emb.filter($"vec_id" % 4 =!= 0)
    val cent = seed.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    Streams.seedAnnIndex(seed, "vec_id", "embedding",
      cent, "cid", "cvec", indexDir)
    val nSeed = spark.read.parquet(s"$indexDir/cells").count()
    def rowsOf(pred: org.apache.spark.sql.Column) =
      emb.filter(pred).as[(Long, Seq[Float])].collect().toSeq
    val b1 = rowsOf($"vec_id" % 12 === 0)
    val b2 = rowsOf($"vec_id" % 12 === 4)
    val b3 = rowsOf($"vec_id" % 12 === 8)
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = Streams.streamingAnnMaintenance(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      indexDir, outPath).start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b1.take(3) ++ b2.take(3): _*) // pure redelivery batch
      q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally stopQuietly(q)
    // exactly-once state: every vector indexed once, redelivery a no-op
    val cells = spark.read.parquet(s"$indexDir/cells")
    assert(cells.count() == emb.count())
    assert(cells.groupBy($"vec_id").count().filter($"count" > 1).count() == 0)
    assert(spark.read.parquet(outPath).count() == cells.count() - nSeed)
    // probe path ≡ one-shot batch ivfTopK over the full corpus with the
    // SAME frozen model — the maintained index loses nothing
    val qs = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val viaIndex = Streams.annIndexTopK(spark, indexDir,
        "vec_id", "embedding", qs, "qid", "qvec", k = 5, probes = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    val batch = Similarity.ivfTopK(emb, "vec_id", "embedding",
        qs, "qid", "qvec", cent, "cid", "cvec", k = 5, probes = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq.sorted
    assert(viaIndex == batch,
      s"index probe ${viaIndex.take(3)}… != batch ivfTopK ${batch.take(3)}…")
    // the incremental assignments match the batch assignment rule
    val fromIndex = cells.select($"vec_id", $"cell".cast("long"))
      .as[(Long, Long)].collect().toSeq.sorted
    val batchAssign = Similarity.assignCells(emb, "vec_id", "embedding",
        cent, "cid", "cvec")
      .select($"vec_id", $"cell".cast("long"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(fromIndex == batchAssign)
  }
}
