package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("normalize lowercases, strips punctuation, collapses whitespace") {
    val out = Seq("  Hello,   WORLD!! 42 ").toDF("text")
      .select(TextOps.normalize($"text")).as[String].collect().head
    assert(out == "hello world 42")
  }

  test("shingles produce k-gram distinct set; degenerate short doc kept") {
    val out = Seq("a b c d").toDF("text")
      .select(TextOps.shingles($"text", 2)).as[Seq[String]].collect().head
    assert(out == Seq("a_b", "b_c", "c_d"))
    val short = Seq("solo").toDF("text")
      .select(TextOps.shingles($"text", 2)).as[Seq[String]].collect().head
    assert(short == Seq("solo"))
  }

  test("langId picks stopword-profile argmax with deterministic tiebreak") {
    val df = Seq(
      ("the cat and the dog", "en"),
      ("le chat et la porte pour", "fr"),
      ("el perro y la casa para es", "es"),
      ("xyzzy qwerty", "und")).toDF("text", "expected")
    val got = df.select($"expected", TextOps.langId($"text").as("got"))
      .filter($"expected" =!= $"got").count()
    assert(got == 0)
  }

  test("exact dedup clusters normalized variants") {
    val docs = Seq(
      (1L, "Hello World"), (2L, "hello,   world!"), (3L, "different text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").select("keep_id", "n_dups")
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash est_jaccard ~ true jaccard for identical and disjoint docs") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // identical
      (3L, "z y x w v u t s")) // disjoint
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 2, numHashes = 12, rowsPerBand = 3, tau = 0.0)
    val got = pairs.select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(got((1L, 2L)) == 1.0) // identical docs agree on every component
    assert(!got.contains((1L, 3L))) // disjoint docs share no band bucket
  }

  test("withSignatureFast: identical docs share full signature, disjoint don't") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "z y x w v"))
      .toDF("doc_id", "text")
    val sig = Dedup.withSignatureFast(docs, "doc_id", "text", 2, 8)
      .orderBy("doc_id").collect()
    val (s1, s2, s3) = (sig(0).toSeq.tail, sig(1).toSeq.tail, sig(2).toSeq.tail)
    assert(s1 == s2)
    assert(s1 != s3)
  }

  test("simhash: identical docs have hamming 0; token order ignored") {
    val h = Seq("alpha beta gamma", "gamma beta alpha", "totally different words here")
      .toDF("text").select(Dedup.simhash($"text", 16)).as[Long].collect().toSeq
    assert(h(0) == h(1))
    assert(h.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("ngramJaccardPairs computes exact jaccard with blocking") {
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c e", "s1"), (3L, "a b c d", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 1, tau = 0.0,
        blockCols = Seq("source"))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    // only (1,2) within s1: |{a,b,c}| / |{a,b,c,d,e}| = 0.6; (1,3) blocked
    assert(out == Seq((1L, 2L, 0.6)))
  }

  test("rollingFingerprint is order-sensitive where md5 fingerprint is not") {
    val df = Seq("alpha beta", "beta alpha").toDF("text")
    val rolling = df.select(TextOps.rollingFingerprint($"text")).as[Long].collect().toSeq
    assert(rolling(0) != rolling(1))
    val sorted = df.select(TextOps.fingerprint(concat_ws(" ",
      sort_array(TextOps.tokens($"text"))))).as[String].collect().toSeq
    assert(sorted(0) == sorted(1))
  }

  test("simhashPairsBanded equals the all-pairs baseline (exact recall by pigeonhole)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely unrelated content about databases and query engines"),
      (5L, "the quick brown fox jumps over the lazy dog"),
      (6L, "yet another distinct document with its own vocabulary entirely"))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val allPairs = norm(Dedup.simhashPairs(docs, "doc_id", "text", 16, 4)
      .select($"id_a", $"id_b", $"hamming".cast("int")))
    val banded = norm(Dedup.simhashPairsBanded(docs, "doc_id", "text", 16, 4, 8)
      .select($"id_a", $"id_b", $"hamming".cast("int")))
    assert(banded == allPairs)
    assert(allPairs.nonEmpty) // the near-identical docs must actually pair up
  }

  test("prefixSum matches a global running-sum window") {
    val df = (0L until 100L).map(i => (i, i % 7 + 1)).toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"k")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expected = df.withColumn("cum", sum($"v").over(w))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val got = graft.ops.Relational.prefixSum(df, "k", "v", "cum", rangeSize = 16L)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("prefixMax is the exclusive strictly-smaller-order running max, ties excluded") {
    // duplicated order keys (k % 13) — ties must see the SAME prefix-max,
    // excluding each other; values deliberately non-monotone
    val df = (0L until 100L).map(i => (i % 13, (i * 37) % 29)).toDF("k", "v")
    val rows = df.as[(Long, Long)].collect().toSeq
    val expected = rows.map { case (k, _) =>
      val smaller = rows.filter(_._1 < k).map(_._2)
      k -> (if (smaller.isEmpty) None else Some(smaller.max))
    }.toMap
    val got = graft.ops.Relational.prefixMax(df, "k", "v", "pm", rangeSize = 4L)
      .select("k", "pm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // every row with the same k agrees, and matches the brute force
    got.foreach { case (k, pm) => assert(pm == expected(k), s"k=$k") }
    // negated keys flip the order: prefix-max over strictly LARGER k
    val neg = df.withColumn("nk", -$"k")
    val gotDesc = graft.ops.Relational.prefixMax(neg, "nk", "v", "pm", rangeSize = 4L)
      .select("k", "pm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    val expDesc = rows.map { case (k, _) =>
      val larger = rows.filter(_._1 > k).map(_._2)
      k -> (if (larger.isEmpty) None else Some(larger.max))
    }.toMap
    gotDesc.foreach { case (k, pm) => assert(pm == expDesc(k), s"desc k=$k") }
  }

  test("bloom membership is one-sided: every true member probes positive") {
    val members = Seq("a_b", "c_d", "e_f").toDF("g")
    val bm = Dedup.bloomBitmap(members, "g", mBits = 1024)
    assert(bm.length == 1024 / 64 &&
      bm.map(java.lang.Long.bitCount).sum <= 6)
    val probe = Seq("a_b", "c_d", "e_f", "zz_qq", "x_y").toDF("g")
    val got = probe.filter(Dedup.bloomMightContain(col("g"), typedLit(bm), 1024))
      .as[String].collect().toSet
    assert(Set("a_b", "c_d", "e_f").subsetOf(got)) // no false negatives
  }

  test("connectedComponents: chain graph collapses to one cluster, islands stay apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (7L, 7L), (8L, 7L)))
  }

  test("chunkRows emits ordered non-overlapping m-token chunks; identical docs share hashes") {
    val docs = Seq(
      (1L, "a b c d e f"), // chunks: a_b_c_d, e_f
      (2L, "a b c d e f"), // identical → same two hashes
      (3L, "e f")) // equals doc 1's tail chunk
      .toDF("doc_id", "text")
    val out = TextOps.chunkRows(docs, "doc_id", "text", 4)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_hash")
      .as[(Long, Long, String)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq((1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L), (3L, 0L)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    assert(byDoc(1L) == byDoc(2L)) // identical docs, identical chunk hashes
    assert(byDoc(3L).head == byDoc(1L)(1)) // "e f" == doc 1's second chunk
    assert(byDoc(1L).distinct.size == 2)
  }

  test("connectedComponents: distributed loop path (collectThreshold=0) matches union-find") {
    // reversed/duplicated edge directions must not matter on either path
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (7L, 8L), (8L, 7L), (10L, 9L))
      .toDF("id_a", "id_b")
    val expected = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (7L, 7L), (8L, 7L), (9L, 9L), (10L, 9L))
    val viaLoop = Dedup.connectedComponents(pairs, collectThreshold = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val viaUf = Dedup.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(viaLoop == expected)
    assert(viaUf == expected)
  }

  test("chunkTextRows chunks reassemble to the normalized text in order") {
    val docs = Seq((1L, "The quick brown fox, jumps over the lazy dog!"),
      (2L, "short one")).toDF("doc_id", "text")
    val rebuilt = TextOps.chunkTextRows(docs, "doc_id", "text", 3)
      .groupBy($"doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct($"chunk_idx", $"chunk"))),
        c => c.getField("chunk")), " ").as("r"))
      .as[(Long, String)].collect().toMap
    val expected = docs.select($"doc_id", TextOps.normalize($"text"))
      .as[(Long, String)].collect().toMap
    assert(rebuilt == expected)
  }

  test("lshPairsBetween probes only across frames, never within a side") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"), // new (0 mod 5)
      (5L, "alpha beta gamma delta epsilon"), // new dup of 0 — must NOT pair
      (1L, "alpha beta gamma delta epsilon"), // corpus dup — must pair with 0 and 5
      (2L, "totally different words here entirely")).toDF("doc_id", "text")
    val sh = TextOps.shingleRows(docs, "doc_id", "text", 2)
    val signed = Dedup.signatureOfShingles(sh, "doc_id", 12).cache()
    val isNew = $"doc_id" % 5 === 0
    val pairs = Dedup.lshPairsBetween(signed.filter(isNew), signed.filter(!isNew),
        "doc_id", 12, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (5L, 1L)))
    signed.unpersist()
  }

  test("x113 recall eval: bucket surfaces are internally consistent") {
    val rows = SparkEntry.queries("x113_lsh_recall")(
      spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, nt, nf, ppm) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(b >= 0 && b <= 10, s"decile out of range: $b")
      assert(nt > 0 && nf >= 0 && nf <= nt, s"found $nf of $nt in bucket $b")
      assert(ppm == nf * 1000000L / nt, "recall_ppm inconsistent")
    }
  }

  test("x114 impact report totals equal the cluster labels they summarize") {
    val sf = "/root/testdata/sf0.001"
    val report = SparkEntry.queries("x114_dedup_impact")(spark, sf).collect()
    spark.catalog.clearCache()
    val labels = Dedup.lshDedupClusters(
      graft.Tables.load(spark, sf, "documents"), "doc_id", "text",
      shingleK = 2, numHashes = 12, rowsPerBand = 3,
      candTau = 0.25, jaccardTau = 0.2)
    val byCluster = labels.groupBy($"cluster").count()
      .as[(Long, Long)].collect()
    spark.catalog.clearCache()
    // every cluster has >= 2 members and the report's member/drop totals
    // recompose exactly from the label frame
    assert(byCluster.forall(_._2 >= 2))
    val members = report.map(r => r.getLong(0) * r.getLong(1)).sum
    val dropped = report.map(_.getLong(2)).sum
    assert(members == byCluster.map(_._2).sum, "cluster membership mismatch")
    assert(dropped == byCluster.map(_._2 - 1).sum, "survivor-drop count mismatch")
    report.foreach(r => assert(r.getLong(3) >= 0, "negative chars_dropped"))
  }

  test("scrubPii replaces emails, urls, digit runs; URL stops at newline") {
    val out = Seq("mail me at bob@example.com or see https://ex.co/a?id=12345 code 987654")
      .toDF("text").select(TextOps.scrubPii($"text")).as[String].collect().head
    assert(out == "mail me at <EMAIL> or see <URL> code <NUM>")
    val nl = Seq("see https://ex.co\nImportant line").toDF("text")
      .select(TextOps.scrubPii($"text")).as[String].collect().head
    assert(nl == "see <URL>\nImportant line")
  }

  test("quality score rewards clean text over noisy") {
    val scores = Seq(
      ("clean prose with reasonable length and flow and more words to fill space", "clean"),
      ("!!!.,;;;??? 123 456 789 000 111", "noisy"))
      .toDF("text", "tag")
      .select($"tag", TextOps.qualityScore($"text").as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("clean") > scores("noisy"))
  }

  test("x128 chaining audit: pair accounting exact, planted chain reports its weak pair") {
    import org.apache.spark.sql.functions._
    // catalog surface invariants on real data: every audited cluster
    // counts exactly C(size, 2) pairs, direct + chained partitions them
    val out = SparkEntry.queries("x128_chaining_audit")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (size, nPairs, nDirect, nChained) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nPairs == size * (size - 1) / 2, s"cluster ${r.getLong(0)}")
      assert(nDirect + nChained == nPairs && nDirect >= size - 1)
    }
    spark.catalog.clearCache()
    // planted chain: A~B and B~C share halves with B, but A and C share
    // nothing — transitive closure welds them into one cluster whose A-C
    // pair must surface as chained
    val half1 = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val half2 = (1 to 12).map(i => s"beta$i").mkString(" ")
    val half3 = (1 to 12).map(i => s"gamma$i").mkString(" ")
    val docs = Seq((1L, half1), (2L, s"$half1 $half2"), (3L, s"$half2 $half3"),
      (4L, half3)).toDF("doc_id", "text")
    // 1-row bands + no estimate filter: candidate recall ≈ 1 at these
    // J's, and the exact-Jaccard verify (deterministic) decides the
    // links — the weld is a fixed function of this corpus
    val labels = graft.dedup.Dedup.lshDedupClusters(docs, "doc_id", "text",
      shingleK = 2, numHashes = 12, rowsPerBand = 1,
      candTau = 0.0, jaccardTau = 0.2)
    val clusters = labels.as[(Long, Long)].collect().groupBy(_._2)
      .values.map(_.map(_._1).toSet).toSet
    // one welded cluster containing a doc pair with zero shingle overlap
    assert(clusters.exists(c => c.size >= 3))
    spark.catalog.clearCache()
  }

  test("x135 prefix filter returns EXACTLY the brute-force >= tau pairs (no recall loss), boundary included") {
    // trigram-shingle sets with the short-doc tail rule, mirrored here
    def sh3(text: String): Set[String] = {
      val t = text.split(" ").toVector
      (0 to math.max(t.length - 3, 0))
        .map(i => t.slice(i, math.min(i + 3, t.length)).mkString("_")).toSet
    }
    val texts = Map(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the rug",  // 3 of 5 trigrams shared: J = 0.6
      3L -> "dogs run far away now",   // disjoint
      4L -> "the cat sat",             // tail-rule single shingle, J(1,4)=0.25
      6L -> "the cat sat on the mat",  // J(1,6) = 1.0
      7L -> "a b c d e",
      8L -> "a b c d x y")             // J(7,8) = 2/5 — the exact boundary
    val docs = texts.toSeq.toDF("doc_id", "text")
    val out = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        k = 3, tauNum = 2, tauDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val sets = texts.view.mapValues(sh3).toMap
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a < b
      j = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      if j >= 0.4
    } yield (a, b) -> j).toMap
    assert(out == expect)
    assert(expect.contains((7L, 8L)) && expect((7L, 8L)) == 0.4) // boundary in
    assert(expect.size < texts.size * (texts.size - 1) / 2)
    spark.catalog.clearCache()
  }

  test("x141 copy matrix: totals equal the verified pair count; pairs normalized upper-triangular") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents")
    val out = SparkEntry.queries("x141_source_copy_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    // normalization + flag consistency
    out.foreach { case (x, y, n, cross) =>
      assert(x <= y && n > 0 && cross == (x != y))
    }
    // total pairs == the independent candidate+verify count
    val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 2, numHashes = 12, rowsPerBand = 3, tau = 0.25)
    val nVer = Dedup.jaccardForPairs(docs, "doc_id", "text", k = 2,
        cand.select($"id_a", $"id_b"))
      .filter($"jaccard" >= 0.2).count()
    assert(out.map(_._3).sum == nVer && nVer > 0)
    spark.catalog.clearCache()
  }

  test("x145 deletion impact: replay from the cluster labels; untouched clusters stay silent") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val labels = Dedup.lshDedupClusters(Tables.load(spark, sf, "documents"),
        "doc_id", "text", shingleK = 2, numHashes = 12, rowsPerBand = 3,
        candTau = 0.25, jaccardTau = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = labels.groupBy(_._2).flatMap { case (cl, g) =>
      val del = g.count(_._1 < 20).toLong
      if (del == 0) None
      else Some(cl -> ((g.length.toLong, del,
        g.collect { case (id, _) if id >= 20 => id }
          .sorted.headOption)))
    }
    val out = SparkEntry.queries("x145_deletion_impact")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out == expect && out.nonEmpty)
    // and the untouched clusters really are absent
    val touched = labels.filter(_._1 < 20).map(_._2).toSet
    assert(out.keySet == touched.intersect(labels.map(_._2).toSet))
    spark.catalog.clearCache()
  }

  test("x135 on the corpus table equals the quadratic shingle-set self-join") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents")
    val out = SparkEntry.queries("x135_prefix_filter_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute force: all-pairs over the same distinct trigram-shingle sets
    val td = TextOps.shingleRows(docs, "doc_id", "text", 3)
      .select($"doc_id", $"g")
    val sizes = td.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val brute = td.select($"doc_id".as("id_a"), $"g")
      .join(td.select($"doc_id".as("id_b"), $"g"), Seq("g"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("common"))
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("na")), Seq("id_a"))
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("nb")), Seq("id_b"))
      .select($"id_a", $"id_b",
        ($"common".cast("double") / ($"na" + $"nb" - $"common")).as("j"))
      .filter($"j" >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out == brute && out.nonEmpty)
    spark.catalog.clearCache()
  }
}
