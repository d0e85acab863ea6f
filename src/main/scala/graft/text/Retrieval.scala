package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval + hybrid fusion for corpus curation (the retrieval
  * half of a training-data pipeline: benchmark-similarity mining, seed
  * expansion, hybrid dedup candidate generation).
  *
  * BM25 (Robertson/Sparck-Jones, the Lucene practical form) is expressed
  * as the inverted-index probe it is at scale: corpus token rows are the
  * posting lists, the query term set broadcasts, and only postings whose
  * term occurs in some query ever flow — document text never shuffles,
  * df/avgdl aggregate with partial combine. Per-term contributions
  * quantize to integer MICRO-units with an explicit floor() before the
  * per-document sum (the x120 pattern), so scores are integer-exact,
  * order-free under any partitioning, and bit-replayable by an external
  * SQL engine — no double-summation fold needed.
  *
  * RRF (reciprocal-rank fusion, Cormack et al. '09) fuses rank lists with
  * NO doubles at all: contribution = 1e9 div (60 + rank), integer
  * division, summed as longs.
  */
object Retrieval {

  /** BM25 top-`k` corpus docs per query doc. Query terms are the DISTINCT
    * tokens of the query text (query-side tf = 1 — the standard short-
    * query form, declared contract). df/avgdl/N come from `corpus` only.
    * Output: (query_id, rank, idCol, score_micro) — score in integer
    * micro-units, rank by score desc / id asc. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame,
               idCol: String, textCol: String, qidCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // postings (id, tok, tf, dl) from ONE tokenize + ONE exchange. The
    // r1–r12 form re-tokenized the corpus in three independent
    // aggregation subplans (tf, dl, df); the r13–r15 form cached one
    // frame but built it with two window sorts + a dedup over the full
    // occurrence frame. The pin makes every downstream consumer (df,
    // scoring) read the cache. No repartition before tokenize: for
    // linear per-row work the scan splits provide the parallelism, and
    // the extra exchange measured slower (the r13 lesson — rebalance
    // only pays for CPU-dense kernels like x106's pair scoring). avgdl
    // stays an explicit sum/count division of exact longs.
    // explicit hash(id) BEFORE the agg: it satisfies the (id, tok)
    // grouping by the subset rule AND the per-id dl window — ONE exchange
    // where the planner's defaults (hash(id, tok) for the agg, then
    // hash(id) for the window) pay two over the widest frame in the
    // query. tf comes from a HASH aggregation over the occurrence rows
    // (long buffer, codegen'd), and dl = Σ tf rides a window over the
    // already-deduped per-(id, tok) frame — the r15 shape ran two window
    // sorts + a dedup over the full occurrence frame inside the cache
    // fill (12.8 CPU-s at sf0.1), and every concurrent consumer of the
    // cache blocked on that fill's block-lock (the x126 census: zero-CPU
    // same-wall lock-wait stages). Same values, ~10× cheaper fill.
    val postings = graft.ops.InternalCaches.register(
      TextOps.tokenRows(corpus, idCol, textCol)
        .filter(col("tok") =!= "")
        .repartition(col(idCol))
        .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
        .withColumn("dl",
          sum(col("tf")).over(Window.partitionBy(col(idCol)))))
    // corpus-global scalars (N, Σdl) COLLECTED driver-side — one row,
    // bounded by construction. This first action also materializes the
    // postings cache SERIALLY before any consumer branch exists, so the
    // dfreq broadcast build and the contrib chain read a warm cache
    // instead of racing the fill's block-lock (the x126 census showed
    // the race as zero-CPU same-wall lock-wait stages; same cure as
    // x131's stat collect — the x144/x171 lesson)
    val statRow = postings
      .groupBy(col(idCol)).agg(min(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      .head()
    val nDocs = statRow.getLong(0)
    val totDl = if (statRow.isNullAt(1)) 0L else statRow.getLong(1)
    val qt = TextOps.tokenRows(queries, qidCol, textCol)
      .filter(col("tok") =!= "")
      .select(col(qidCol).as("__qid"), col("tok")).distinct()
    // postings pruned to query terms BEFORE df: df is only needed for
    // matched terms, and the semi-join keeps the frame narrow
    val tfQ = postings.join(broadcast(qt.select(col("tok")).distinct()),
      Seq("tok"), "left_semi")
    val dfreq = tfQ.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val contrib = broadcast(qt)
      .join(tfQ, Seq("tok"))
      .join(broadcast(dfreq), Seq("tok"))
      .withColumn("__c", expr(
        // idf * tf-component, floored to micro-units: every double op is
        // written identically in the DuckDB oracle (literals cast, same
        // association), and floor-then-cast is the engine-portable
        // double→int bridge (bare CAST rounds on DuckDB, truncates here)
        // every literal casts to DOUBLE explicitly: bare 0.5 / 1.2 parse
        // as DECIMAL on both engines and would push parts of the chain
        // into exact decimal arithmetic on one engine but not the other
        // n_docs/tot_dl are driver-collected literals; every double op
        // (conversion, association order) is unchanged vs the column
        // form, so the floored micro value is bit-identical
        s"""CAST(floor(
           ln(((CAST($nDocs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) + CAST(1.0 AS DOUBLE))
           * ((CAST(tf AS DOUBLE) * (CAST($k1 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
              / (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE)
                 + CAST($b AS DOUBLE) * (CAST(dl AS DOUBLE)
                         / (CAST($totDl AS DOUBLE) / CAST($nDocs AS DOUBLE))))))
           * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"""))
    val scored = contrib.groupBy(col("__qid"), col(idCol))
      .agg(sum(col("__c")).as("score_micro"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score_micro").desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("score_micro"))
  }

  /** Reciprocal-rank fusion of two rank lists `(query_id, idCol, rank)`:
    * fused score = Σ 1e9 div (60 + rank) over the lists an item appears
    * in (missing → contributes 0) — all-integer, the Cormack '09 k=60
    * constant. Output: (query_id, rank, idCol, rrf_score) top-`k` by
    * fused score desc / id asc. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int): DataFrame = {
    def pts(df: DataFrame, out: String) = df.select(col("query_id"), col(idCol),
      expr("CAST(1000000000 AS BIGINT) div (60 + rank)").as(out))
    val fused = pts(a, "__pa").join(pts(b, "__pb"),
        Seq("query_id", idCol), "full_outer")
      .select(col("query_id"), col(idCol),
        (coalesce(col("__pa"), lit(0L)) + coalesce(col("__pb"), lit(0L)))
          .as("rrf_score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("rrf_score"))
  }
}
