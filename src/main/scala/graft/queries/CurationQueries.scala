package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 curation operators: the data-mixing / dedup / filtering steps a
  * large-scale training-data pipeline runs AFTER the per-document analysis
  * in [[ExtensionQueries]] — semantic dedup over embeddings, boilerplate
  * n-gram mining, chunk-level (line) dedup, per-source mixture sampling, a
  * hashed-feature linear quality classifier, and context-window chunking.
  *
  * Same oracle conventions as ExtensionQueries: md5-on-strings for every
  * hash so DuckDB replays it, scaled-integer sums before any double
  * division, total tiebreaks on every window.
  */
object CurationQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** DuckDB SQL fragment mirroring TextOps.normalize (same string as
    * ExtensionQueries.normSql — duplicated privately to keep each query
    * file self-contained). */
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  private def cosSql(a: String, b: String) =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ───── SemDeDup: nearest-centroid cells (centroids = vec_id < 16, the
    // same deterministic coarse quantizer as x15/x30) + within-cell cosine
    // prune at τ=0.4; survivor of each semantic cluster = lowest vec_id
    "x36_semantic_dedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        cent, "cid", "cvec", tau = 0.4)
    }),

    // ───── boilerplate mining: 3-gram shingles appearing in ≥ 5 distinct
    // docs (the frequent-line/template detection step before removal).
    // shingleRows is distinct per (doc, g), so count(*) IS doc frequency —
    // partial-combine aggregation, no distinct-expand
    "x37_boilerplate_ngrams" -> ((s, d) => {
      TextOps.shingleRows(t(s, d, "documents"), "doc_id", "text", 3)
        .groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 5)
    }),

    // ───── chunk-level (CCNet/RefinedWeb "line") dedup: 4-token chunks,
    // global chunk frequency by distinct-doc count, per-doc duplicate
    // ratio + keep flag. Only md5 hashes shuffle — never chunk text
    "x38_chunk_dedup" -> ((s, d) => {
      // cache: the chunk frame feeds the global-frequency branch AND the
      // per-doc join side (caller-managed lifecycle, as in ExtensionQueries)
      val ch = TextOps.chunkRows(t(s, d, "documents"), "doc_id", "text", 4)
        .cache()
      val freq = ch.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      ch.join(freq, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
        .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
          (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"),
          (col("n_dup_chunks").cast("double") / col("n_chunks") < 0.5).as("keep"))
    }),

    // ───── mixture sampling: per-source keep rate (data-mixing weights),
    // applied as a deterministic md5 threshold per doc — pure integer
    // compare, no doubles, replayed exactly by the oracle
    "x39_mixture_sample" -> ((s, d) => {
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("long")
      val ratePct = (lit(25L) + (srcNum % 16) * 5).as("rate_pct")
      val h = conv(substring(md5(concat(lit("mix_"), col("doc_id"))), 1, 6), 16, 10)
        .cast("long")
      t(s, d, "documents").select(col("doc_id"), col("source"), ratePct,
        (h * 100 < (lit(25L) + (srcNum % 16) * 5) * 16777216L).as("sampled"))
    }),

    // ───── hashed-feature linear quality classifier (fastText-shaped):
    // token → md5 bucket (64) → deterministic integer weight in
    // [-500, 500]; doc score = mean token weight. Long sums only; the one
    // double division happens after aggregation, identically in both
    // engines
    "x40_quality_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val agg = TextOps.tokenRows(docs, "doc_id", "text")
        .filter(col("tok") =!= "")
        .withColumn("w", TextOps.hashedTokenWeight(col("tok")))
        .groupBy(col("doc_id"))
        .agg(sum(col("w")).as("sw"), count(lit(1)).as("n"))
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n"), lit(0L)).as("n_tokens"),
          (col("sw").cast("double") / 500.0 / col("n")).as("score"),
          coalesce(col("sw") > 0, lit(false)).as("keep"))
    }),

    // ───── composed curation v2 — the round-3 ops chained as one recipe:
    // chunk-dedup keep ∧ classifier keep ∧ mixture sample → per-source
    // surviving doc/token counts. ONE tokenization feeds both the chunk
    // and classifier branches (chunkRowsOfTokens / shared token cache)
    "x42_curation_v2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // cache: the token frame feeds the chunk branch and the classifier
      // branch (caller-managed lifecycle, as elsewhere)
      val tr = TextOps.tokenRows(docs, "doc_id", "text").cache()
      val ch = TextOps.chunkRowsOfTokens(tr, "doc_id", 4)
      val freq = ch.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      val dedupKeep = ch.join(freq, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg((sum(when(col("nd") > 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)) < 0.5).as("k_dedup"))
      val clsKeep = tr.filter(col("tok") =!= "")
        .withColumn("w", TextOps.hashedTokenWeight(col("tok")))
        .groupBy(col("doc_id"))
        .agg((sum(col("w")) > 0).as("k_cls"), count(lit(1)).as("n_tokens"))
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("long")
      val sampled = conv(substring(md5(concat(lit("mix_"), col("doc_id"))), 1, 6), 16, 10)
        .cast("long") * 100 < (lit(25L) + (srcNum % 16) * 5) * 16777216L
      docs.select(col("doc_id"), col("source"), sampled.as("k_mix"))
        .join(dedupKeep, Seq("doc_id"))
        .join(clsKeep, Seq("doc_id"))
        .filter(col("k_dedup") && col("k_cls") && col("k_mix"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    }),

    // ───── x33's broadcast-bloom twin: decontamination when the benchmark
    // suite is too big to broadcast as an exact set. The bench 4-grams
    // compress to a 2^18-bit bloom (collect bounded by mBits, NOT by
    // suite size); corpus grams probe the bitmap literal — a pure
    // projection, no join on the corpus side. One-sided error: flags ⊇
    // the exact x33 flags (false positives only), and the oracle replays
    // the identical bitmap semantics, FPs included
    "x43_bloom_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val mBits = 262144
      val bench = TextOps.shingleRows(docs.filter(col("doc_id") < 20),
        "doc_id", "text", 4).select(col("g")).distinct()
      val bm = lit(Dedup.bloomBitmap(bench, "g", mBits))
      val flagged = TextOps.shingleRows(docs.filter(col("doc_id") >= 20),
          "doc_id", "text", 4)
        .filter(Dedup.bloomMightContain(col("g"), bm, mBits))
        .select(col("doc_id")).distinct()
      docs.filter(col("doc_id") >= 20).select(col("doc_id"))
        .join(flagged.withColumn("c", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("c"), lit(false)).as("contaminated_bloom"))
    }),

    // ───── count-min-sketch heavy hitters: exact corpus-wide top-20
    // tokens plus a contract bit asserting the CMS estimate landed inside
    // its guarantee band (est ≥ exact always — counters only over-count;
    // est ≤ exact + 2ε·N with ε = 0.001 at confidence 0.99 — asserted at
    // DOUBLE the eps bound, so the contract holds with huge margin). The
    // sketch is one partial-aggregated pass (counter-array merge is
    // commutative → partition-order independent), the probe set is the
    // bounded top-k list, and the sketch itself is ~100 KB however large
    // the corpus — the form that still runs when exact per-token counts
    // don't fit anywhere. Completes the sketch family: HLL (x31), GK
    // (x28/x29), bloom (x43), CMS (here).
    "x44_heavy_hitters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tr = TextOps.tokenRows(docs, "doc_id", "text")
        .filter(col("tok") =!= "").cache()
      val top = tr.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok")).limit(20)
      val sketchBytes = tr
        .select(expr(
          "count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
        .collect()(0).getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      val band = (0.002 * cms.totalCount()).toLong
      val rows = top.collect().map { r =>
        val tok = r.getString(0)
        val n = r.getLong(1)
        val est = cms.estimateCount(tok)
        org.apache.spark.sql.Row(tok, n, est >= n && est <= n + band)
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tok",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("n_exact",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("cms_ok",
          org.apache.spark.sql.types.BooleanType, nullable = true)))
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
    }),

    // ───── context-window chunking: overlapping training windows (size 32
    // tokens, stride 24) per doc — the (doc, window, token-range) contract
    // a tokenize-and-pack stage emits. Pure per-row arithmetic: no token
    // explosion, no shuffle beyond the scan
    "x41_train_windows" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          explode(sequence(lit(0L),
            floor((col("n_tokens") - 1) / lit(24)).cast("long"))).as("win_idx"))
        .select(col("doc_id"), col("win_idx"),
          (col("win_idx") * 24).as("tok_start"),
          least(col("win_idx") * 24 + 32, col("n_tokens")).as("tok_end"))
    }))

  val oracle: Map[String, String] = Map(
    "x36_semantic_dedup" ->
      s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < 16),
         assign AS (SELECT e.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
           FROM ev e, cent c),
         cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
         d AS (SELECT DISTINCT b.vec_id
           FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
           JOIN ev ea ON ea.vec_id = a.vec_id
           JOIN ev eb ON eb.vec_id = b.vec_id
           WHERE ${cosSql("ea.v", "eb.v")} >= 0.4)
         SELECT c.vec_id, c.cell, d.vec_id IS NOT NULL AS is_dup
         FROM cells c LEFT JOIN d ON c.vec_id = d.vec_id""",
    "x37_boilerplate_ngrams" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(tk) - 3, 0) + 2),
             i -> array_to_string(list_slice(tk, i, least(i + 2, len(tk))), '_')))) AS g
           FROM toks)
         SELECT g, COUNT(*) AS n_docs FROM sh GROUP BY g HAVING COUNT(*) >= 5""",
    "x38_chunk_dedup" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents),
         ch AS (SELECT doc_id, unnest(list_transform(
             range(0, CAST(ceil(len(tk) / 4.0) AS BIGINT)),
             i -> md5(array_to_string(list_slice(tk, CAST(i * 4 + 1 AS INT),
               CAST(least((i + 1) * 4, len(tk)) AS INT)), '_')))) AS h
           FROM toks),
         f AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h),
         per AS (SELECT doc_id, COUNT(*) AS n_chunks,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
           FROM ch JOIN f USING (h) GROUP BY doc_id)
         SELECT doc_id, n_chunks, n_dup_chunks,
           CAST(n_dup_chunks AS DOUBLE) / n_chunks AS dup_ratio,
           CAST(n_dup_chunks AS DOUBLE) / n_chunks < 0.5 AS keep
         FROM per""",
    "x39_mixture_sample" ->
      """SELECT doc_id, source,
           25 + (CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 16) * 5
             AS rate_pct,
           CAST(('0x' || substr(md5('mix_' || doc_id), 1, 6)) AS BIGINT) * 100
             < (25 + (CAST(regexp_extract(source, '(\d+)', 1) AS BIGINT) % 16) * 5)
               * 16777216 AS sampled
         FROM documents""",
    "x40_quality_classifier" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
           FROM documents),
         w AS (SELECT doc_id,
             CAST(('0x' || substr(md5('w' ||
               (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64)), 1, 8))
               AS BIGINT) % 1001 - 500 AS wt
           FROM toks WHERE tok <> ''),
         agg AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS sw,
             COUNT(*) AS n FROM w GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(agg.n, 0) AS n_tokens,
           CAST(sw AS DOUBLE) / 500.0 / n AS score,
           COALESCE(sw > 0, FALSE) AS keep
         FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""",
    "x44_heavy_hitters" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok
           FROM documents)
         SELECT tok, COUNT(*) AS n_exact, TRUE AS cms_ok
         FROM toks WHERE tok <> ''
         GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20""",
    "x43_bloom_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
             range(1, greatest(len(tk) - 4, 0) + 2),
             i -> array_to_string(list_slice(tk, i, least(i + 3, len(tk))), '_')))) AS g
           FROM toks),
         bpos AS (SELECT DISTINCT unnest([
             CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 262144,
             CAST(('0x' || substr(md5(g), 9, 8)) AS BIGINT) % 262144]) AS pos
           FROM (SELECT DISTINCT g FROM sh WHERE doc_id < 20)),
         fl AS (SELECT DISTINCT doc_id FROM sh
           WHERE doc_id >= 20
             AND CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 262144
               IN (SELECT pos FROM bpos)
             AND CAST(('0x' || substr(md5(g), 9, 8)) AS BIGINT) % 262144
               IN (SELECT pos FROM bpos))
         SELECT d.doc_id, f.doc_id IS NOT NULL AS contaminated_bloom
         FROM documents d LEFT JOIN fl f ON d.doc_id = f.doc_id
         WHERE d.doc_id >= 20""",
    "x42_curation_v2" ->
      s"""WITH toks AS (SELECT doc_id, string_split($normSql, ' ') AS tk FROM documents),
         ch AS (SELECT doc_id, unnest(list_transform(
             range(0, CAST(ceil(len(tk) / 4.0) AS BIGINT)),
             i -> md5(array_to_string(list_slice(tk, CAST(i * 4 + 1 AS INT),
               CAST(least((i + 1) * 4, len(tk)) AS INT)), '_')))) AS h
           FROM toks),
         f AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY h),
         ded AS (SELECT doc_id,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) < 0.5 AS k_dedup
           FROM ch JOIN f USING (h) GROUP BY doc_id),
         tw AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
         w AS (SELECT doc_id,
             CAST(('0x' || substr(md5('w' ||
               (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64)), 1, 8))
               AS BIGINT) % 1001 - 500 AS wt
           FROM tw WHERE tok <> ''),
         cls AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) > 0 AS k_cls,
             COUNT(*) AS n_tokens FROM w GROUP BY doc_id),
         mix AS (SELECT doc_id, source,
             CAST(('0x' || substr(md5('mix_' || doc_id), 1, 6)) AS BIGINT) * 100
               < (25 + (CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 16) * 5)
                 * 16777216 AS k_mix
           FROM documents)
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
         FROM mix JOIN ded USING (doc_id) JOIN cls USING (doc_id)
         WHERE k_dedup AND k_cls AND k_mix
         GROUP BY source""",
    "x41_train_windows" ->
      s"""WITH n AS (SELECT doc_id, len(string_split($normSql, ' ')) AS n_tokens
           FROM documents)
         SELECT doc_id,
           unnest(range(0, (n_tokens - 1) // 24 + 1)) AS win_idx,
           unnest(list_transform(range(0, (n_tokens - 1) // 24 + 1),
             i -> i * 24)) AS tok_start,
           unnest(list_transform(range(0, (n_tokens - 1) // 24 + 1),
             i -> least(i * 24 + 32, n_tokens))) AS tok_end
         FROM n""")
}
