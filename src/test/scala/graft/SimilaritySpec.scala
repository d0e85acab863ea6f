package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f), Array(-1.0f, -2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Similarity.cosine($"a", $"b").as("same"),
      Similarity.cosine($"a", $"c").as("opp")).as[(Double, Double)].collect().head
    assert(math.abs(r._1 - 1.0) < 1e-12 && math.abs(r._2 + 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc, excludes self, breaks ties by id") {
    val q = corpus.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, "qid", "qvec", 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // nearest to (1,0,0): 1 (cos~0.994), then 2/4 tie at 0 -> id order, 3 is -1
    assert(out == Seq(1L, 2L, 4L))
  }

  test("bucketedTopK returns subset of brute-force candidates with same scores") {
    val q = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // one hyperplane: v0 and v1 share bucket "1" (positive x), so each is
    // the other's candidate; a second (0,1,0) anchor would isolate them
    val anchors = Seq(Array(1.0f, 0.0f, 0.0f))
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, "qid", "qvec", 5)
      .select("query_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val bk = Similarity.bucketedTopK(corpus, "vec_id", "embedding", q, "qid", "qvec", anchors, 5)
      .select("query_id", "neighbor_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(bk.subsetOf(bf) && bk.nonEmpty)
  }

  test("multi-probe recovers neighbors one hyperplane away") {
    val q = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    // two anchors isolate v0 ("10") from v1 ("11") — single-probe finds
    // nothing, Hamming-1 probing crosses the boundary
    val anchors = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
    val single = Similarity.bucketedTopK(corpus, "vec_id", "embedding",
      q, "qid", "qvec", anchors, 5)
    assert(single.count() == 0)
    val multi = Similarity.bucketedTopK(corpus, "vec_id", "embedding",
      q, "qid", "qvec", anchors, 5, probeFlips = 1)
    val got = multi.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)) && got.contains((1L, 0L)))
    // still a subset of brute force with identical scores
    val bf = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      q, "qid", "qvec", 5)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    val mp = multi.select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(mp.subsetOf(bf))
  }

  test("nearDupPairs finds high-cosine pairs only, a<b") {
    val out = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L)))
  }

  test("nearDupPairsBanded: subset of all-pairs with identical scores; finds co-bucketed dups") {
    // 2 anchors = 1 table of 2 bits: v0=(1,0,0) and v1=(0.9,0.1,0) both
    // code "10" against the x/z hyperplanes, so the banded path must
    // surface their pair with the same cosine the all-pairs join computes
    // (a y-axis anchor would separate them: dot(v1, ŷ)=0.1 > 0)
    val anchors = Seq(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 0.0f, 1.0f))
    val banded = Similarity.nearDupPairsBanded(corpus, "vec_id", "embedding",
        tau = 0.9, anchors = anchors, bitsPerTable = 2)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val allPairs = Similarity.nearDupPairs(corpus, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(banded.subsetOf(allPairs))
    assert(banded.map(p => (p._1, p._2)) == Set((0L, 1L)))
  }

  test("semanticDedup marks higher-id near-dups within a cell, keeps the rest") {
    // centroids = vectors 0 and 2: cells split on x-vs-y alignment.
    // v1 lands in v0's cell at cos≈0.994 ≥ 0.9 → duplicate of v0;
    // v3/v4 sit alone (or below tau) → kept. Cell of v3 (-x): nearest
    // centroid by cosine is 2 (cos 0 beats -1); v4 ties 0/2 at cos 0 →
    // lowest cid wins (0).
    val cent = corpus.filter($"vec_id" isin (0L, 2L))
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        cent, "cid", "cvec", tau = 0.9)
      .orderBy("vec_id").select("vec_id", "cell", "is_dup")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((0L, 0L, false), (1L, 0L, true), (2L, 2L, false),
      (3L, 2L, false), (4L, 0L, false)))
  }

  test("quantizeCodes maps per-dim extremes to 0/255, interior points by round-half-up") {
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val (lows, highs) = Similarity.dimRanges(corpus, "embedding")
    // dim 1 spans [-1, 1], dim 2 [0, 1], dim 3 [0, 1]
    assert(lows == Seq(-1.0, 0.0, 0.0) && highs == Seq(1.0, 1.0, 1.0))
    val codes = corpus
      .select($"vec_id", Similarity.quantizeCodes($"embedding", lows, highs).as("c"))
      .orderBy("vec_id").as[(Long, Seq[Long])].collect().toMap
    assert(codes(0L) == Seq(255L, 0L, 0L)) // (1,0,0): dim1 max, others min
    assert(codes(3L) == Seq(0L, 0L, 0L))   // (-1,0,0): dim1 min
    // v1 = (0.9, 0.1, 0): (0.9+1)/2*255+0.5 = 242.75 → 242; 0.1*255+0.5 = 26
    assert(codes(1L) == Seq(242L, 26L, 0L))
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
  }

  test("quantized integer dot via graft_vec_dot equals exact BigInt arithmetic") {
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val (lows, highs) = Similarity.dimRanges(corpus, "embedding")
    val coded = corpus.select($"vec_id",
      Similarity.quantizeCodes($"embedding", lows, highs).as("codes"))
    val local = coded.as[(Long, Seq[Long])].collect().toMap
    val viaKernel = coded
      .select($"vec_id", Similarity.dot($"codes".cast("array<float>"),
        lit(local(1L).map(_.toFloat).toArray)).cast("long").as("idot"))
      .as[(Long, Long)].collect().toMap
    local.foreach { case (id, c) =>
      val exact = c.zip(local(1L)).map { case (a, b) => a * b }.sum
      assert(viaKernel(id) == exact, s"vec $id")
    }
  }

  test("quantizeCodes rejects a degenerate dimension") {
    intercept[IllegalArgumentException] {
      Similarity.quantizeCodes(lit(Array(1.0f)), Seq(3.0), Seq(3.0))
    }
  }

  test("pqAdcTopK: centroid neighbors score their exact squared L2 (perfect reconstruction)") {
    // dim 4, m = 2 subspaces of 2 dims; centroids chosen so every
    // subvector is uniquely closest to itself. Vectors 0-3 ARE the
    // codebook → their codes reconstruct them exactly, so the ADC
    // distance to them must equal the true ||q - v||^2.
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(4.0f, 0.0f, 2.0f, 0.0f)),
      (2L, Array(0.0f, 4.0f, 0.0f, 2.0f)),
      (3L, Array(4.0f, 4.0f, 2.0f, 2.0f)),
      (10L, Array(0.5f, 0.25f, 0.25f, 0.5f)), // query
      (11L, Array(3.5f, 0.5f, 1.5f, 0.25f))
    ).toDF("vec_id", "embedding")
    val cent = vecs.filter($"vec_id" < 4)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val out = Similarity.pqAdcTopK(
      vecs.filter($"vec_id" < 4), "vec_id", "embedding",
      cent, "cid", "cvec",
      vecs.filter($"vec_id" >= 10), "vec_id", "embedding",
      m = 2, dim = 4, k = 4).collect()
    assert(out.length === 8) // 2 queries x 4 ranked centroids
    val q = Map(
      10L -> Array(0.5, 0.25, 0.25, 0.5),
      11L -> Array(3.5, 0.5, 1.5, 0.25))
    val c = Map(
      0L -> Array(0.0, 0.0, 0.0, 0.0), 1L -> Array(4.0, 0.0, 2.0, 0.0),
      2L -> Array(0.0, 4.0, 0.0, 2.0), 3L -> Array(4.0, 4.0, 2.0, 2.0))
    out.foreach { r =>
      val (qid, nid, d) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val exact = q(qid).zip(c(nid)).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(d - (math.rint(exact * 1e4) / 1e4)) < 1e-9,
        s"q=$qid n=$nid adc=$d exact=$exact")
    }
    // ranks follow ascending true distance with neighbor-id tiebreak
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getDouble(3)).toSeq ==
        sorted.map(_.getDouble(3)).sortBy(identity).toSeq)
    }
  }

  test("ivfPqTopK with probes = nlist degenerates to flat PQ-ADC") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val qs = emb.filter($"vec_id" < 4)
    val flat = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
        cent, "cid", "cvec", qs, "vec_id", "embedding", m = 8, dim = 64, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val ivf = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
        cent, "cid", "cvec", qs, "vec_id", "embedding",
        m = 8, dim = 64, k = 5, probes = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(ivf == flat) // every cell probed → same candidates → same ranking
  }

  test("residual encoding composes: exact recall where raw-PQ collides, on the same budget") {
    // The IVFADC motivation (Jégou '11 §III) as an executable law: corpus
    // = every combination c_j + r_l of 8 well-separated coarse centroids
    // (100·e_j) and 8 small residual atoms — 64 vectors that coarse⊗fine
    // can cover EXACTLY with 8+8 codewords. Residual encoding recovers
    // r_l perfectly (fine book = the atoms) → ADC distance inside a cell
    // is the exact ‖q−v‖² → recall 1.0. Raw PQ on the SAME budget (the 8
    // coarse vectors as its codebook, x122's convention) cannot represent
    // the residuals at all: every vector in a cell encodes to the SAME
    // codes, ADC ties collapse to id order, and recall crashes.
    val dim = 8
    val atoms = (0 until 8).map(l =>
      Array.tabulate(dim)(i => (((l * 7 + i * 3) % 11) - 5).toFloat)) // in [-5, 5]
    val corpus = (for (j <- 0 until 8; l <- 0 until 8) yield {
      val v = Array.tabulate(dim)(i => if (i == j) 100f else 0f)
      ((j * 8 + l).toLong + 100L, v.zip(atoms(l)).map { case (a, b) => a + b })
    }).toDF("vec_id", "embedding")
    val cent = (0 until 8).map(j =>
        (j.toLong, Array.tabulate(dim)(i => if (i == j) 100f else 0f)))
      .toDF("cid", "cvec")
    val fine = (0 until 8).map(l => (l.toLong + 50L, atoms(l).map(_.toDouble)))
      .toDF("fcid", "fvec")
    val queries = corpus.filter($"vec_id" % 8 === 3) // one per cell
    val k = 3
    // exact ground truth, driver-side (64 vectors)
    val local = corpus.as[(Long, Array[Float])].collect().toMap
    val truth = queries.as[(Long, Array[Float])].collect().map { case (qid, qv) =>
      qid -> local.filterNot(_._1 == qid).map { case (id, v) =>
        (id, qv.zip(v).map { case (a, b) => (a - b).toDouble * (a - b) }.sum)
      }.toSeq.sortBy(t => (t._2, t._1)).take(k).map(_._1).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      truth.map { case (q, t) => (got.getOrElse(q, Set.empty) & t).size.toDouble / k }
        .sum / truth.size
    }
    val raw = recall(Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
      cent, "cid", "cvec", queries, "vec_id", "embedding",
      m = 2, dim = dim, k = k, probes = 1))
    val res = recall(Similarity.ivfPqResidualTopK(corpus, "vec_id", "embedding",
      cent, "cid", "cvec", fine, "fcid", "fvec", queries, "vec_id", "embedding",
      m = 2, dim = dim, k = k, probes = 1))
    assert(res == 1.0, s"residual recall $res — exact decomposition must be exact")
    assert(res > raw, s"residual $res must beat raw-PQ $raw on composable data")
  }

  test("ivfPqResidualTopK: perfect reconstruction — ADC distance is exact inside the cell") {
    // same decomposable corpus: residual codes reconstruct v exactly, so
    // every reported adc_dist must equal the true squared L2 (4 dp)
    val dim = 8
    val atoms = (0 until 8).map(l =>
      Array.tabulate(dim)(i => (((l * 7 + i * 3) % 11) - 5).toFloat))
    val corpus = (for (j <- 0 until 8; l <- 0 until 8) yield {
      val v = Array.tabulate(dim)(i => if (i == j) 100f else 0f)
      ((j * 8 + l).toLong + 100L, v.zip(atoms(l)).map { case (a, b) => a + b })
    }).toDF("vec_id", "embedding")
    val cent = (0 until 8).map(j =>
        (j.toLong, Array.tabulate(dim)(i => if (i == j) 100f else 0f)))
      .toDF("cid", "cvec")
    val fine = (0 until 8).map(l => (l.toLong + 50L, atoms(l).map(_.toDouble)))
      .toDF("fcid", "fvec")
    val queries = corpus.filter($"vec_id" % 8 === 5)
    val local = corpus.as[(Long, Array[Float])].collect().toMap
    val out = Similarity.ivfPqResidualTopK(corpus, "vec_id", "embedding",
      cent, "cid", "cvec", fine, "fcid", "fvec", queries, "vec_id", "embedding",
      m = 2, dim = dim, k = 3, probes = 1).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qid, nid, d) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val exact = local(qid).zip(local(nid))
        .map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      assert(math.abs(d - math.rint(exact * 1e4) / 1e4) < 1e-9,
        s"q=$qid n=$nid adc=$d exact=$exact")
    }
  }

  test("pqAdcTopK: codes of codebook members are their own centroid ids") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    // a centroid's distance to itself is 0 per subspace; with random
    // float data no other centroid shares a subvector, so rank-1 ADC
    // neighbor of each centroid-as-query is... itself excluded; instead
    // assert via the catalog surface: every query gets exactly k rows,
    // distances non-negative and non-decreasing in rank
    val out = SparkEntry.queries("x121_pq_adc_ann")(spark, "/root/testdata/sf0.001")
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === 5)
      val sorted = rs.sortBy(_.getLong(1))
      val ds = sorted.map(_.getDouble(3)).toSeq
      assert(ds.forall(_ >= 0.0))
      assert(ds == ds.sortBy(identity))
    }
  }

  test("kmeansMicro separates two obvious clusters; dist2 is the exact integer distance to the final centroid") {
    // two tight groups around (0,0) and (10,10); seeds = ids 0,1 (one in
    // each group), so Lloyd converges immediately and stays put
    val pts = Seq(
      (0L, Array(0.0f, 0.1f)), (1L, Array(10.0f, 10.0f)),
      (2L, Array(0.1f, 0.0f)), (3L, Array(9.9f, 10.1f)),
      (4L, Array(0.0f, 0.0f)), (5L, Array(10.1f, 9.9f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.kmeansMicro(pts, "vec_id", "embedding", k = 2, iters = 2)
    val rows = m.assignments.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(0, 1, 0, 1, 0, 1))
    // dist2 cross-check against the returned centroid grid
    val cents = m.centroids.toMap
    val micro = pts.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6).toLong)).toMap
    rows.foreach { case (id, cl, d2) =>
      val exact = micro(id).zip(cents(cl))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d2 == exact, s"id=$id cluster=$cl")
    }
    // centroid = floor-mean of its members on the micro grid
    val g0 = Seq(0L, 2L, 4L).map(micro)
    val want0 = g0.transpose.map(vs =>
      math.floor(vs.sum.toDouble / vs.length).toLong)
    assert(cents(0).toSeq == want0)
  }

  test("kmeansMicro iters=0 is nearest-seed assignment with the lowest-cid tie") {
    // v2 sits exactly between the two seeds -> tie -> cluster 0
    val pts = Seq(
      (0L, Array(0.0f)), (1L, Array(2.0f)), (2L, Array(1.0f)))
      .toDF("vec_id", "embedding")
    val m = Similarity.kmeansMicro(pts, "vec_id", "embedding", k = 2, iters = 0)
    val byId = m.assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byId == Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("kmeansMicro: an empty cluster keeps its previous centroid") {
    // identical seeds: every vector ties to cluster 0, cluster 1 goes
    // empty on the update and must carry its init centroid unchanged
    val pts = Seq(
      (0L, Array(1.0f, 1.0f)), (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val m = Similarity.kmeansMicro(pts, "vec_id", "embedding", k = 2, iters = 2)
    assert(m.assignments.collect().map(_.getInt(1)).forall(_ == 0))
    assert(m.centroids(1)._2.toSeq == Seq(1000000L, 1000000L))
  }

  test("pcaPowerProjection: planted 1-D data projects linearly (odd, ordered, equally spaced) and matches the BigInt replay") {
    // points t·(3,4), t ∈ {-2,-1,0,1,2}: mean 0, scatter rank-1 along
    // (3,4) — the projection must be an odd, strictly increasing, exactly
    // equally-spaced linear function of t
    val pts = Seq(-2, -1, 0, 1, 2).map(t =>
      (t.toLong + 2L, Array(3.0f * t, 4.0f * t))).toDF("vec_id", "embedding")
    val rows = Similarity.pcaPowerProjection(pts, "vec_id", "embedding")
      .collect()
    // output-type law (r8): two BIGINT halves, lo ∈ [0, 2^62), and the
    // reconstruction p = hi·2^62 + lo is the exact projection
    val two62 = BigInt(2).pow(62)
    rows.foreach(r => assert(r.getLong(2) >= 0L))
    val out = rows
      .map(r => r.getLong(0) ->
        (BigInt(r.getLong(1)) * two62 + BigInt(r.getLong(2))))
      .toMap
    val p = (-2 to 2).map(t => out(t.toLong + 2L))
    assert(p(2) == 0)                              // proj(0) = 0
    assert(p.zip(p.tail).forall { case (a, b) => a < b })
    assert(p(0) == -p(4) && p(1) == -p(3))         // odd
    assert(p(4) == p(3) * 2)                       // equally spaced
    // independent BigInt replay of the contract (quantize → center →
    // scatter → w1 → floor/1024 → w2 → project) for t = 1
    val qs = Seq(-2, -1, 0, 1, 2).map(t => Seq(BigInt(3000 * t), BigInt(4000 * t)))
    val s = Array.tabulate(2, 2)((i, j) => qs.map(v => v(i) * v(j)).sum)
    val w1 = (0 until 2).map(i => s(i)(0) + s(i)(1))
    val w1n = w1.map(w => BigInt(math.floor(w.toDouble / 1024.0).toLong))
    val w2 = (0 until 2).map(i => s(i)(0) * w1n(0) + s(i)(1) * w1n(1))
    assert(out(3L) == BigInt(3000) * w2(0) + BigInt(4000) * w2(1))
  }

  test("x134 learned-centroid IVF: scores agree with brute force on every returned pair") {
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        q, "qid", "qvec", k = 499)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val out = SparkEntry.queries("x134_kmeans_ivf")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 8 * 5)
    out.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(bf(key) == r.getDouble(3), s"score drift at $key")
    }
    // per-query: ranks are 1..n and scores non-increasing
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val ds = sorted.map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted.reverse)
    }
  }

  test("semanticDedupAssigned: dup iff a LOWER-id cellmate sits at cos >= tau; cross-cell twins stay invisible") {
    import org.apache.spark.sql.functions.{col => c}
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.01f)),
      (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cells = Seq((0L, 7), (1L, 7), (2L, 9), (3L, 7))
      .toDF("vid", "cl")
    val out = Similarity.semanticDedupAssigned(pts, "vec_id", "embedding",
        cells, "vid", "cl", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).sortBy(_._1)
    // v1 dups v0 inside cell 7; v2 is v0's exact twin but lives in cell 9
    // (the SemDeDup boundary-miss trade, asserted explicitly); v3 is far
    assert(out.toSeq == Seq((0L, 7, false), (1L, 7, true),
      (2L, 9, false), (3L, 7, false)))
  }

  test("probe sweeps: each per-probe slice ≡ the single-probe operator, both encodings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val fine = Similarity.residuals(
        emb.filter($"vec_id" >= 16 && $"vec_id" < 32),
        "vec_id", "embedding", cent, "cid", "cvec")
      .select($"vec_id".as("fcid"), $"resid".as("fvec"))
    val qs = emb.filter($"vec_id" < 8)
    val probes = Seq(1, 2, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id", $"adc_dist")
        .as[(Long, Int, Long, Double)].collect().toSet
    val absSweep = Similarity.ivfPqSweepTopK(emb, "vec_id", "embedding",
      cent, "cid", "cvec", qs, "vec_id", "embedding",
      m = 8, dim = 64, k = 5, probes = probes)
    val resSweep = Similarity.ivfPqResidualSweepTopK(emb, "vec_id",
      "embedding", cent, "cid", "cvec", fine, "fcid", "fvec",
      qs, "vec_id", "embedding", m = 8, dim = 64, k = 5, probes = probes)
    for (p <- probes) {
      assert(rows(absSweep.filter($"probes" === p)) ==
        rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
          cent, "cid", "cvec", qs, "vec_id", "embedding",
          m = 8, dim = 64, k = 5, probes = p)),
        s"abs sweep slice p=$p drifted from ivfPqTopK")
      assert(rows(resSweep.filter($"probes" === p)) ==
        rows(Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding",
          cent, "cid", "cvec", fine, "fcid", "fvec",
          qs, "vec_id", "embedding", m = 8, dim = 64, k = 5, probes = p)),
        s"residual sweep slice p=$p drifted from ivfPqResidualTopK")
    }
  }

  test("assignCells: the map-side literal fold over a driver-local centroid frame ≡ the broadcast-join path") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    def rows(c: org.apache.spark.sql.DataFrame) =
      Similarity.assignCells(emb, "vec_id", "embedding", c, "cid", "cvec")
        .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    // distributed centroid frame → crossJoin×window path; pinLocal'd
    // frame → the literal argmax projection. Same cells, row for row —
    // including every cosine near-tie this corpus has
    val viaJoin = rows(cent)
    val viaFold = rows(Similarity.pinLocal(cent))
    assert(viaFold == viaJoin, "map-side cell fold drifted from the join path")
    // and the fold really is the plan in play: no exchange above the scan
    val foldPlan = Similarity.assignCells(emb, "vec_id", "embedding",
      Similarity.pinLocal(cent), "cid", "cvec")
      .queryExecution.executedPlan.toString
    assert(!foldPlan.contains("Window") && !foldPlan.contains("BroadcastNestedLoop"),
      s"local-centroid assignment still plans the join form:\n$foldPlan")
  }

  test("ivfTopKLarge ≡ ivfTopK row for row (x15's shape)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank".cast("long"), $"neighbor_id", $"cos_sim")
        .as[(Long, Long, Long, Double)].collect().toSet
    val small = rows(Similarity.ivfTopK(emb, "vec_id", "embedding",
      q, "qid", "qvec", cent, "cid", "cvec", k = 5, probes = 2))
    val large = rows(Similarity.ivfTopKLarge(emb, "vec_id", "embedding",
      q, "qid", "qvec", cent, "cid", "cvec", k = 5, probes = 2))
    assert(large == small, "ivfTopKLarge drifted from ivfTopK")
  }

  test("coarseModel: pinned ≤ bound, unpinned pass-through above it, same rows either side (x177's scale contract)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    val kC = math.max(8L, math.sqrt(n.toDouble).toLong).toInt
    def isLocal(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]
    // K ≤ bound → driver-pinned LocalRelation (map-side fold downstream)
    val pinned = Similarity.coarseModel(emb, n, "vec_id", "embedding")
    assert(isLocal(pinned), "coarseModel under the bound should pinLocal")
    // K > bound (force with a tiny pinBound) → the frame passes through
    // UNPINNED instead of require-failing: the >16M-vectors regime
    val over = Similarity.coarseModel(emb, n, "vec_id", "embedding",
      pinBound = kC - 1)
    assert(!isLocal(over),
      "coarseModel above the bound must NOT pin (and must not throw)")
    // identical model rows on both paths
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"cid", $"cvec").as[(Long, Array[Float])].collect()
        .map { case (c, v) => (c, v.toSeq) }.toSet
    assert(rows(pinned) == rows(over), "pin state changed the model rows")
    // and ivfTopKLarge accepts the unpinned model (broadcast-join
    // assignment), matching the pinned plan's output row for row
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def out(c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKLarge(emb, "vec_id", "embedding", q, "qid", "qvec",
          c, "cid", "cvec", k = 5, probes = 2)
        .select($"query_id", $"rank".cast("long"), $"neighbor_id", $"cos_sim")
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(out(over) == out(pinned),
      "unpinned coarse model changed ivfTopKLarge's rows")
  }

  test("dual sweep: per-scheme slices ≡ the standalone sweeps, and pinLocal/cellsOpt change nothing") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val fine = Similarity.pinLocal(Similarity.residuals(
        emb.filter($"vec_id" >= 16 && $"vec_id" < 32),
        "vec_id", "embedding", cent, "cid", "cvec")
      .select($"vec_id".as("fcid"), $"resid".as("fvec")))
    val qs = emb.filter($"vec_id" < 8)
    val probes = Seq(1, 2, 4)
    val cells = Similarity.assignCells(
        emb, "vec_id", "embedding", cent, "cid", "cvec")
      .select($"vec_id", $"cell")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"probes", $"query_id", $"rank", $"neighbor_id", $"adc_dist")
        .as[(Long, Long, Int, Long, Double)].collect().toSet
    val dual = Similarity.ivfPqDualSweepTopK(emb, "vec_id", "embedding",
      cent, "cid", "cvec", fine, "fcid", "fvec", qs, "vec_id", "embedding",
      m = 8, dim = 64, k = 5, probes = probes, cellsOpt = Some(cells))
    assert(rows(dual.filter($"scheme" === "abs")) ==
      rows(Similarity.ivfPqSweepTopK(emb, "vec_id", "embedding",
        cent, "cid", "cvec", qs, "vec_id", "embedding",
        m = 8, dim = 64, k = 5, probes = probes)),
      "dual sweep abs slice drifted from ivfPqSweepTopK")
    assert(rows(dual.filter($"scheme" === "residual")) ==
      rows(Similarity.ivfPqResidualSweepTopK(emb, "vec_id",
        "embedding", cent, "cid", "cvec", fine, "fcid", "fvec",
        qs, "vec_id", "embedding", m = 8, dim = 64, k = 5, probes = probes)),
      "dual sweep residual slice drifted from ivfPqResidualSweepTopK")
  }

  test("abs sweep variants: each variant slice ≡ ivfPqSweepTopK on that variant over the shared cells") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // variant B: reverse the dimension order — an orthogonal transform
    val embR = emb.select($"vec_id",
      org.apache.spark.sql.functions.array(
        (0 until 64).reverse.map(i => $"embedding".getItem(i)): _*).as("embedding"))
    def centOf(e: org.apache.spark.sql.DataFrame) = e.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    def qsOf(e: org.apache.spark.sql.DataFrame) = e.filter($"vec_id" < 8)
    val cells = Similarity.assignCells(
        emb, "vec_id", "embedding", centOf(emb), "cid", "cvec")
      .select($"vec_id", $"cell")
    val probes = Seq(1, 3)
    val out = Similarity.ivfPqAbsSweepVariants(
      Seq(("a", emb, centOf(emb), qsOf(emb)),
        ("b", embR, centOf(embR), qsOf(embR))),
      "vec_id", "embedding", "cid", "cvec", "vec_id", "embedding",
      m = 8, dim = 64, k = 5, probes = probes, cells = cells)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"probes", $"query_id", $"rank", $"neighbor_id", $"adc_dist")
        .as[(Long, Long, Int, Long, Double)].collect().toSet
    for ((tag, c, ct, qv) <- Seq(("a", emb, centOf(emb), qsOf(emb)),
      ("b", embR, centOf(embR), qsOf(embR)))) {
      assert(rows(out.filter($"scheme" === tag)) ==
        rows(Similarity.ivfPqSweepTopK(c, "vec_id", "embedding",
          ct, "cid", "cvec", qv, "vec_id", "embedding",
          m = 8, dim = 64, k = 5, probes = probes,
          cellsOpt = Some(cells))),
        s"variant '$tag' drifted from the standalone sweep")
    }
  }
}
