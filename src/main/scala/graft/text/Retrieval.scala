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
    // postings (id, tok, tf, dl) from ONE tokenize + ONE exchange: tf
    // and dl are both windows over the hash(id)-partitioned token rows
    // (hash(id) satisfies the (id, tok) clustering, so the second window
    // and the per-(id, tok) dedup ride the same exchange). The r1–r12
    // form re-tokenized the corpus in three independent aggregation
    // subplans (tf, dl, df) — concurrent broadcast builds hid some of
    // that on the wall, but the work was 3×. The pin makes every
    // downstream consumer (stats, df, scoring) read the cache; no
    // driver-side collects anywhere, so independent broadcast builds
    // still overlap. No repartition before tokenize: for linear per-row
    // work the scan splits provide the parallelism, and the extra
    // exchange measured slower (the r13 lesson — rebalance only pays
    // for CPU-dense kernels like x106's pair scoring). avgdl stays an
    // explicit sum/count division of exact longs.
    val wTok = Window.partitionBy(col(idCol), col("tok"))
    val wDoc = Window.partitionBy(col(idCol))
    // explicit hash(id) BEFORE the windows: it satisfies wTok's (id, tok)
    // clustering by the subset rule, wDoc's (id), AND the (id, tok)
    // dedup — ONE exchange where the planner's defaults (hash(id, tok)
    // for wTok, then hash(id) for wDoc) pay two over the widest frame in
    // the query
    val postings = graft.ops.InternalCaches.register(
      TextOps.tokenRows(corpus, idCol, textCol)
        .filter(col("tok") =!= "")
        .repartition(col(idCol))
        .withColumn("tf", count(lit(1)).over(wTok))
        .withColumn("dl", count(lit(1)).over(wDoc))
        .select(col(idCol), col("tok"), col("tf"), col("dl"))
        .dropDuplicates(idCol, "tok"))
    val stats = broadcast(postings
      .groupBy(col(idCol)).agg(min(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl")))
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
      .crossJoin(stats)
      .withColumn("__c", expr(
        // idf * tf-component, floored to micro-units: every double op is
        // written identically in the DuckDB oracle (literals cast, same
        // association), and floor-then-cast is the engine-portable
        // double→int bridge (bare CAST rounds on DuckDB, truncates here)
        // every literal casts to DOUBLE explicitly: bare 0.5 / 1.2 parse
        // as DECIMAL on both engines and would push parts of the chain
        // into exact decimal arithmetic on one engine but not the other
        s"""CAST(floor(
           ln(((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
               / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))) + CAST(1.0 AS DOUBLE))
           * ((CAST(tf AS DOUBLE) * (CAST($k1 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
              / (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST($b AS DOUBLE)
                 + CAST($b AS DOUBLE) * (CAST(dl AS DOUBLE)
                         / (CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))))
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
