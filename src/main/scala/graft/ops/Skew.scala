package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles most runtime skew; explicit salting remains necessary
  * when one side must aggregate BEFORE joining (AQE can't split a skewed
  * aggregation) or when the skew is known a priori (a "null key" bucket, a
  * celebrity user). These helpers implement the classic recipe:
  * replicate the small side `saltBuckets` times, scatter the big side's
  * hot keys uniformly across the buckets.
  */
object Skew {

  /** Above this many hot buckets the per-bucket block counts ship as a
    * broadcast join instead of a literal map: try_element_at over a map
    * literal is a per-row linear scan, fine for a handful of boilerplate
    * templates, wrong for a degenerate thousands-of-hot-buckets census. */
  private[graft] val MaxLiteralHotBuckets = 64

  /** The literal-map probe key: one string per key tuple. The SAME
    * expression computes the map's keys at census-collect time (see
    * [[censusHead]]) — both encodings come from one code path, so the
    * lookup cannot silently miss on formatting differences (the hazard of
    * mixing JVM `toString` with SQL `concat_ws`: nulls, binary, strings
    * containing the separator). Distinct tuples can still COLLIDE under
    * concat_ws (null-skipping, embedded ':'), but a collision only makes
    * two buckets share an `nblk`; every row of a bucket computes the same
    * probe string, so rows within a bucket always agree on `nblk` — the
    * invariant the triangle decomposition's correctness rests on. In-repo
    * callers key on non-null longs, where the encoding is injective. */
  private def probeKey(keyNames: Seq[String]): Column =
    concat_ws(":", keyNames.map(k => col(k).cast("string")): _*)

  /** Collect the census head with the probe key materialized server-side
    * (`__k` column) alongside the bucket population (`__n`).
    *
    * Ordered top-k, not a bare `limit().collect()`: CollectLimitExec runs
    * a PROGRESSIVE partition scan (1 partition, then scaleUpFactor× more
    * per round until the limit fills) — on an empty-or-small hot set that
    * is 2–3 SERIAL driver round-trips per census (the r16 verdict's "two
    * eager collects" on x49's critical path). `orderBy(keys).limit(n)`
    * plans TakeOrderedAndProject: ONE parallel job over every partition
    * (which also fills the caller's cached band frame in one pass).
    * Set-identical: the head is only ever consumed whole (≤ 64 buckets →
    * literal map) or as a length check (> 64 → broadcast path keeps the
    * FULL hot frame), so the induced order changes nothing. */
  private def censusHead(hot: DataFrame, keyNames: Seq[String])
      : Array[org.apache.spark.sql.Row] =
    hot.withColumn("__k", probeKey(keyNames))
      .orderBy(keyNames.map(col): _*)
      .limit(MaxLiteralHotBuckets + 1).collect()

  /** Attach `__nblk` (block count per row, 1 for cold rows) to `frame`,
    * given the already-collected head of the hot census ([[censusHead]]
    * rows, carrying `__n` and the Spark-computed `__k`). Small hot sets
    * (the common case — a flood is a few templates) inline as a literal
    * map lookup, keeping the guard's plan free of extra join nodes; large
    * hot sets fall back to a broadcast hash join of the census frame.
    * The census action itself is paid either way (the caller needs the
    * empty check); this decides how its RESULT reaches the rows. */
  private def withNblk(hotHead: Array[org.apache.spark.sql.Row],
                       frame: DataFrame, keyNames: Seq[String],
                       hotDf: DataFrame, blockSize: Int): DataFrame =
    if (hotHead.length <= MaxLiteralHotBuckets) {
      val m: Map[String, Int] = hotHead.map { r =>
        val n = r.getAs[Long]("__n")
        r.getAs[String]("__k") -> ((n + blockSize - 1) / blockSize).toInt
      }.toMap
      // try_element_at, not element_at: ANSI mode makes a missing map key
      // an error, and cold rows are the overwhelming majority
      frame.withColumn("__nblk", coalesce(
        try_element_at(typedlit(m), probeKey(keyNames)),
        lit(1)))
    } else
      frame.join(broadcast(hotDf), keyNames, "left")
        .withColumn("__nblk", coalesce(
          ceil(col("__n") / blockSize).cast("int"), lit(1)))
        .drop("__n")

  /** Equi-join `big ⋈ small` on `key`, salted into `saltBuckets` buckets.
    * `big` gets a deterministic per-row bucket (hash of all columns), while
    * `small` is replicated once per bucket — so each hot key's rows spread
    * over `saltBuckets` tasks instead of one straggler.
    * Semantics identical to `big.join(small, key, joinType)` for
    * 1:N joins (small side unique on key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full outer would emit one unmatched copy of a small-side row
    // PER REPLICA — only join types that never output unmatched small rows
    // preserve unsalted semantics (semi/anti qualify: they emit big-side
    // rows only)
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")(
        joinType.toLowerCase),
      s"saltedJoin preserves semantics only for inner/left/semi/anti joins, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** All unordered candidate pairs `(id_a < id_b)` within buckets of
    * `rows` keyed by `keyCols`, with per-task work bounded even when one
    * bucket holds a large fraction of all rows — the LSH hot-band hazard
    * (boilerplate floods in MinHash bands, flat/black frames in perceptual-
    * hash bands: many rows sharing one band value).
    *
    * A naive self-join on the bucket key lands a bucket of population n in
    * ONE task doing n²/2 comparisons. Here each bucket is decomposed into
    * `nblk = ceil(n / blockSize)` hash-blocks and the self-join runs on
    * `(key, blockL, blockR)` with `blockL ≤ blockR` — the triangle
    * decomposition of a self-join (each row replicates to its row of the
    * block-pair triangle). Per-task work is ≤ ~blockSize² and the OUTPUT IS
    * IDENTICAL to the naive join: a cross-block pair appears in exactly one
    * block-pair task, a same-block pair in both orientations, and the final
    * distinct collapses orientation duplicates (the callers' downstream
    * distinct over bands needs the same pass anyway).
    *
    * Buckets at or below `hotThreshold` take `nblk = 1`, so the plan
    * degenerates to the plain bucket self-join. The census that finds hot
    * buckets runs as its OWN bounded action over a cached slim
    * (keys, id) frame — cached because census + both join sides would
    * otherwise each recompute the upstream banding/signature lineage
    * (measured 1.6–2.5× on the uniform-corpus dedup queries before the
    * cache) — and when the census comes back empty the guard machinery is
    * skipped entirely: the result IS the plain self-join, the adaptivity
    * rule every other two-path operator here follows (CC's
    * collectThreshold, broadcast-vs-shuffle). AQE skew-join splitting
    * still applies on top for mid-sized buckets. The cache follows the
    * caller-managed convention (Verify/Bench clear caches per query).
    *
    * `rows` must hold one row per (bucket, id) — ids unique within a
    * bucket — with non-null key columns, the shape every banded-LSH
    * bucket frame here has. Columns other than `keyCols` + `idCol` are
    * dropped. Output: `(id_a, id_b)` distinct, `id_a < id_b`.
    */
  def boundedSelfPairs(rows: DataFrame, keyCols: Seq[String], idCol: String,
                       hotThreshold: Int = 4096,
                       blockSize: Int = 2048): DataFrame = {
    require(keyCols.nonEmpty, "at least one bucket key column")
    require(hotThreshold > 0 && blockSize > 0)
    val keys = keyCols.map(col)
    val slim = InternalCaches.register(rows.select((keys :+ col(idCol)): _*))
    // hot-bucket census: tiny by definition (only buckets over threshold)
    val hot = slim.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
    val hotHead = censusHead(hot, keyCols)
    if (hotHead.isEmpty) {
      // skew-free corpus: no guard tax — one census job over the cached
      // frame, then the plain bucket self-join
      return slim.toDF((keyCols :+ "__ida"): _*).as("a")
        .join(slim.toDF((keyCols :+ "__idb"): _*).as("b"),
          keyCols)
        .filter(col("__ida") < col("__idb"))
        .select(col("__ida").as("id_a"), col("__idb").as("id_b"))
        .distinct()
    }
    val blocked = withNblk(hotHead, slim, keyCols, hot, blockSize)
      .withColumn("__blk",
        pmod(xxhash64(col(idCol)), col("__nblk")).cast("int"))
    // triangle replication: a row in block p serves as the LEFT side of
    // block pairs (p, p..nblk-1) and the RIGHT side of (0..p, p)
    val left = blocked
      .withColumn("__br", explode(sequence(col("__blk"), col("__nblk") - 1)))
      .select((keys ++ Seq(col("__blk").as("__bl"), col("__br"),
        col(idCol).as("__ida"))): _*)
    val right = blocked
      .withColumn("__bl", explode(sequence(lit(0), col("__blk"))))
      .select((keys ++ Seq(col("__bl"), col("__blk").as("__br"),
        col(idCol).as("__idb"))): _*)
    left.join(right, keyCols ++ Seq("__bl", "__br"))
      // same-block pairs would otherwise surface in both orientations;
      // requiring id order there halves the stream into distinct
      .filter(col("__bl") =!= col("__br") || col("__ida") < col("__idb"))
      .filter(col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
      .distinct()
  }

  /** Candidate pairs BETWEEN two bucket frames over disjoint id spaces —
    * the incremental-dedup shape (`left` = new batch, `right` = standing
    * corpus band index) with the right side's hot buckets decomposed as in
    * [[boundedSelfPairs]]: right rows hash into `nblk` blocks, left rows
    * replicate across them, the join key gains the block column. Per-task
    * work ≤ ~(batch-per-bucket × blockSize); output identical to the plain
    * bucket join: distinct `(id_a, id_b)` = (left id, right id). */
  def boundedPairsBetween(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String], idCol: String,
                          hotThreshold: Int = 4096,
                          blockSize: Int = 2048): DataFrame = {
    require(keyCols.nonEmpty, "at least one bucket key column")
    require(hotThreshold > 0 && blockSize > 0)
    val keys = keyCols.map(col)
    // cache the standing-index side: census + the block join would
    // otherwise recompute its banding lineage twice (caller-managed
    // cache convention, as in boundedSelfPairs)
    val r = InternalCaches.register(right.select((keys :+ col(idCol)): _*))
    val l = left.select((keys :+ col(idCol)): _*)
    val hot = r.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold)
    val hotHead = censusHead(hot, keyCols)
    if (hotHead.isEmpty) {
      // skew-free standing index: plain bucket join, no replication
      return l.toDF((keyCols :+ "__ida"): _*)
        .join(r.toDF((keyCols :+ "__idb"): _*), keyCols)
        .select(col("__ida").as("id_a"), col("__idb").as("id_b"))
        .distinct()
    }
    val rb = withNblk(hotHead, r, keyCols, hot, blockSize)
      .withColumn("__b", pmod(xxhash64(col(idCol)), col("__nblk")).cast("int"))
      .select((keys ++ Seq(col("__b"), col(idCol).as("__idb"))): _*)
    val lb = withNblk(hotHead, l, keyCols, hot, blockSize)
      .withColumn("__b", explode(sequence(lit(0), col("__nblk") - 1)))
      .select((keys ++ Seq(col("__b"), col(idCol).as("__ida"))): _*)
    lb.join(rb, keyCols :+ "__b")
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"))
      .distinct()
  }

  /** Candidate pairs from multi-band exact-match LSH over a WIDE band
    * frame (one row per id, one `bandCols` column per band value), with the
    * band vectors CARRIED through pair generation: the caller verifies
    * (Hamming, equality count, …) inline on `bands_a`/`bands_b` instead of
    * re-joining the candidate stream against the wide frame — at scale
    * those re-joins are two extra shuffles of the (large) candidate set.
    *
    * Cross-band duplicates are removed by the first-matching-band rule
    * rather than a `distinct()`: a pair sharing m bands is generated in all
    * m band buckets, but only the bucket of the SMALLEST matching band
    * index emits it (each side sees both full vectors, so the test is a
    * per-row filter). Combined with the triangle-block decomposition of hot
    * buckets (identical to [[boundedSelfPairs]]) the whole generation is
    * ONE shuffle — the bucket join — and per-task work stays ≤ ~blockSize²
    * under degenerate band distributions. Output is exactly one row per
    * unordered pair sharing ≥ 1 band: the same pair set as
    * explode → boundedSelfPairs → distinct, minus the distinct's shuffle.
    *
    * `wide` must hold one row per non-null `idCol`; band columns must
    * share one type (the exact-match bucket value — longs, md5 strings,
    * …). `carryCols` are extra columns carried through generation and
    * returned as `carry_a`/`carry_b` structs — the verify payload (e.g. a
    * MinHash signature) when it is not derivable from the band values;
    * they widen the banding shuffle by their encoded size × number of
    * bands, which is the price of skipping the candidate re-joins.
    * Output: `(id_a < id_b, bands_a, bands_b[, carry_a, carry_b])` with
    * `bands_a`/`carry_a` belonging to `id_a`. */
  def boundedWideBandPairs(wide: DataFrame, idCol: String,
                           bandCols: Seq[String],
                           hotThreshold: Int = 4096,
                           blockSize: Int = 2048,
                           carryCols: Seq[String] = Nil): DataFrame = {
    require(bandCols.nonEmpty, "at least one band column")
    require(hotThreshold > 0 && blockSize > 0)
    val payload =
      if (carryCols.isEmpty) lit(0).as("__pl")
      else struct(carryCols.map(col): _*).as("__pl")
    val slim = InternalCaches.register(wide.select(col(idCol).as("__id"),
      array(bandCols.map(col): _*).as("__bv"), payload))
    val bands = slim.select(col("__id"), col("__bv"), col("__pl"),
      posexplode(col("__bv")).as(Seq("__j", "__band")))
    // a pair appearing in band j survives only if no band j' < j also
    // matches — symmetric in the two sides, so orientation-safe. Built
    // from literal-index array accesses + least() (null-skipping), NOT
    // array higher-order functions: HOF lambdas are interpreted per row,
    // and this predicate runs once per generated candidate
    val firstMatch =
      if (bandCols.length == 1) lit(true)
      else col("__j") === least(bandCols.indices.map(j =>
        when(col("__bva")(j) === col("__bvb")(j), lit(j))): _*)
    val carried: Seq[Column] =
      if (carryCols.isEmpty) Nil
      else Seq(
        when(col("__ida") < col("__idb"), col("__pla")).otherwise(col("__plb"))
          .as("carry_a"),
        when(col("__ida") < col("__idb"), col("__plb")).otherwise(col("__pla"))
          .as("carry_b"))
    def oriented(df: DataFrame): DataFrame = df
      .filter(col("__ida") =!= col("__idb"))
      .filter(firstMatch)
      .select(Seq(
        when(col("__ida") < col("__idb"), col("__ida")).otherwise(col("__idb"))
          .as("id_a"),
        when(col("__ida") < col("__idb"), col("__idb")).otherwise(col("__ida"))
          .as("id_b"),
        when(col("__ida") < col("__idb"), col("__bva")).otherwise(col("__bvb"))
          .as("bands_a"),
        when(col("__ida") < col("__idb"), col("__bvb")).otherwise(col("__bva"))
          .as("bands_b")) ++ carried: _*)
    val hotDf = bands.groupBy(col("__j"), col("__band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > hotThreshold)
    // the census is an action either way (the empty check); collecting its
    // head lets the COMMON cases skip join machinery entirely: no hot
    // buckets → plain self-join, few hot buckets (a boilerplate flood is a
    // handful of templates) → nblk arrives as a literal-map lookup instead
    // of TWO broadcast hash joins (measured ~2.4× guard overhead on the
    // skew stress twins, dominated by those extra plan nodes at small
    // scale). Only a degenerate many-hot-bucket census pays the
    // broadcast-join form.
    val hotHead = censusHead(hotDf, Seq("__j", "__band"))
    if (hotHead.isEmpty) {
      // skew-free: plain bucket self-join, id order dedups orientation
      return oriented(bands
        .select(col("__j"), col("__band"), col("__id").as("__ida"),
          col("__bv").as("__bva"), col("__pl").as("__pla"))
        .join(bands.select(col("__j"), col("__band"), col("__id").as("__idb"),
          col("__bv").as("__bvb"), col("__pl").as("__plb")),
          Seq("__j", "__band"))
        .filter(col("__ida") < col("__idb")))
    }
    val blocked = withNblk(hotHead, bands, Seq("__j", "__band"),
        hotDf, blockSize)
      .withColumn("__blk", pmod(xxhash64(col("__id")), col("__nblk")).cast("int"))
    val left = blocked
      .withColumn("__br", explode(sequence(col("__blk"), col("__nblk") - 1)))
      .select(col("__j"), col("__band"), col("__blk").as("__bl"), col("__br"),
        col("__id").as("__ida"), col("__bv").as("__bva"),
        col("__pl").as("__pla"))
    val right = blocked
      .withColumn("__bl", explode(sequence(lit(0), col("__blk"))))
      .select(col("__j"), col("__band"), col("__bl"), col("__blk").as("__br"),
        col("__id").as("__idb"), col("__bv").as("__bvb"),
        col("__pl").as("__plb"))
    // cross-block pairs surface exactly once (lower block as the left
    // side); same-block pairs in both orientations — id order keeps one
    oriented(left.join(right, Seq("__j", "__band", "__bl", "__br"))
      .filter(col("__bl") =!= col("__br") || col("__ida") < col("__idb")))
  }

  /** [[boundedWideBandPairs]] BETWEEN two wide band frames over disjoint
    * id spaces — the incremental-dedup shape (left = new batch, right =
    * standing corpus index). Hot buckets on the RIGHT (corpus) side
    * decompose into hash-blocks the batch rows fan over, both band
    * vectors (+ optional carry payloads) ride through generation, and
    * cross-band duplicates drop by the first-matching-band rule — no
    * distinct, no candidate re-joins. Output: one row per (left id_a,
    * right id_b) pair sharing ≥ 1 band. */
  def boundedWideBandPairsBetween(left: DataFrame, right: DataFrame,
                                  idCol: String, bandCols: Seq[String],
                                  hotThreshold: Int = 4096,
                                  blockSize: Int = 2048,
                                  carryCols: Seq[String] = Nil): DataFrame = {
    require(bandCols.nonEmpty, "at least one band column")
    require(hotThreshold > 0 && blockSize > 0)
    def payload =
      if (carryCols.isEmpty) lit(0).as("__pl")
      else struct(carryCols.map(col): _*).as("__pl")
    def explodeBands(df: DataFrame) = df
      .select(col(idCol).as("__id"), array(bandCols.map(col): _*).as("__bv"),
        payload)
      .select(col("__id"), col("__bv"), col("__pl"),
        posexplode(col("__bv")).as(Seq("__j", "__band")))
    val lb = explodeBands(left)
    val rb = InternalCaches.register(explodeBands(right)) // census + join both read it
    val firstMatch =
      if (bandCols.length == 1) lit(true)
      else col("__j") === least(bandCols.indices.map(j =>
        when(col("__bva")(j) === col("__bvb")(j), lit(j))): _*)
    val outCols = Seq(col("__ida").as("id_a"), col("__idb").as("id_b"),
      col("__bva").as("bands_a"), col("__bvb").as("bands_b")) ++
      (if (carryCols.isEmpty) Nil
       else Seq(col("__pla").as("carry_a"), col("__plb").as("carry_b")))
    val hot = rb.groupBy(col("__j"), col("__band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > hotThreshold)
    val hotHead = censusHead(hot, Seq("__j", "__band"))
    val l = lb.select(col("__j"), col("__band"), col("__id").as("__ida"),
      col("__bv").as("__bva"), col("__pl").as("__pla"))
    val r = rb.select(col("__j"), col("__band"), col("__id").as("__idb"),
      col("__bv").as("__bvb"), col("__pl").as("__plb"))
    if (hotHead.isEmpty)
      return l.join(r, Seq("__j", "__band")).filter(firstMatch)
        .select(outCols: _*)
    val rblk = withNblk(hotHead, r, Seq("__j", "__band"), hot, blockSize)
      .withColumn("__b", pmod(xxhash64(col("__idb")), col("__nblk")).cast("int"))
    val lblk = withNblk(hotHead, l, Seq("__j", "__band"), hot, blockSize)
      .withColumn("__b", explode(sequence(lit(0), col("__nblk") - 1)))
    lblk.join(rblk, Seq("__j", "__band", "__b")).filter(firstMatch)
      .select(outCols: _*)
  }

  /** Aggregate-then-join skew pattern: two-phase aggregation where the
    * first phase groups on (key, salt) — spreading a hot key's partial
    * aggregation over `saltBuckets` tasks — and the second phase merges the
    * partials per key. `partials` maps each aggregated column to the
    * expression that merges two partials (e.g. sum → sum, count → sum,
    * max → max). */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
                aggs: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(aggs.head, aggs.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
