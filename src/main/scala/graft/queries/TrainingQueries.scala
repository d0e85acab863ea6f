package graft.queries

import graft.Tables
import graft.ops.InternalCaches
import graft.similarity.Similarity
import graft.streaming.Streams
import graft.text.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 trainer-loop operators: the pieces that turn one-shot
  * curation steps into the LOOPS a production pipeline actually runs —
  * iterated BPE tokenizer training (x53 is one merge; this is the
  * selection→application→recount cycle), a continuously-maintained ANN
  * index (x49's append pattern applied to the vector index), and the
  * multi-probe recall curve that grades an IVF-PQ index's probe knob
  * against exact ground truth (the r7 directive-#7 evidence).
  *
  * Same oracle conventions as the other query files (each file
  * self-contained, helpers duplicated privately): md5-free here — all
  * three queries are deterministic algebra both engines replay exactly.
  */
object TrainingQueries {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** DuckDB SQL fragment mirroring TextOps.normalize (the per-file copy,
    * as in CurationQueries). */
  private def normOf(e: String) =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))"

  private def cosSql(a: String, b: String) =
    s"list_inner_product($a, $b) / (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"

  /** One BPE round in the oracle: count adjacent pairs of `src`, pick the
    * (n desc, a, b) winner as `m$i`, apply it with the sentinel-wrap
    * string algebra as `c$i`, and record the post-merge token count as
    * `t$i` — the exact mirror of one TextOps.bpeTrain iteration. */
  private def bpeRoundSql(i: Int, src: String): String =
    s"""g$i AS (SELECT t[j] AS a, t[j + 1] AS b, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT string_split(s, ' ') AS t FROM $src WHERE s <> ''),
             unnest(range(1, len(t))) AS u(j)
           GROUP BY 1, 2),
         m$i AS (SELECT a, b, n FROM g$i ORDER BY n DESC, a, b LIMIT 1),
         c$i AS (SELECT doc_id,
             substr(replace(w, '> <', ' '), 2, len(replace(w, '> <', ' ')) - 2) AS s
           FROM (SELECT doc_id,
               replace('<' || replace(s, ' ', '> <') || '>',
                 '<' || m.a || '> <' || m.b || '>',
                 '<' || m.a || '_' || m.b || '>') AS w
             FROM $src CROSS JOIN m$i m)),
         t$i AS (SELECT CAST(SUM(len(string_split(s, ' '))) AS BIGINT) AS nt
           FROM c$i WHERE s <> '')"""

  /** The probe-dependent half of the x122 IVF-PQ oracle chain for probe
    * count `p`: probed query cells, candidates, ADC ranking, top-10, and
    * the per-query hit count against `truth(qid, nid)`. The probe-
    * independent CTEs (ev/cent/assign/cells/sub/codes/lut) are shared. */
  private def probeBlockSql(p: Int): String =
    s"""qc$p AS (SELECT vec_id AS qid, cid AS cell FROM assign
           WHERE vec_id < 8 AND rn <= $p),
         cand$p AS (SELECT qc.qid, ce.vec_id AS neighbor_id
           FROM qc$p qc JOIN cells ce
           ON ce.cell = qc.cell AND ce.vec_id <> qc.qid),
         adc$p AS (SELECT ca.qid, ca.neighbor_id,
             list_reduce(list(l.d ORDER BY l.s), (a, b) -> a + b) AS dist
           FROM cand$p ca
           JOIN codes c ON c.vec_id = ca.neighbor_id
           JOIN lut l ON l.qid = ca.qid AND l.s = c.s AND l.code = c.code
           GROUP BY ca.qid, ca.neighbor_id),
         top$p AS (SELECT qid, neighbor_id FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY dist ASC, neighbor_id ASC) AS rank FROM adc$p)
           WHERE rank <= 10),
         hit$p AS (SELECT tr.qid,
             CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit
           FROM truth tr LEFT JOIN top$p a
           ON a.qid = tr.qid AND a.neighbor_id = tr.nid
           GROUP BY tr.qid)"""

  /** The RESIDUAL (IVFADC, x123) counterpart of [[probeBlockSql]] for
    * probe count `p`: candidates from the ≤p probed cells of the shared
    * `qca` frame, ADC against the residual codes/LUT (`rcodes`/`rlut`,
    * keyed by the probed cell), top-10, hit count vs `truth`. */
  private def probeResidualBlockSql(p: Int): String =
    s"""candR$p AS (SELECT qc.qid, qc.qcell, ce.vec_id AS neighbor_id
           FROM qca qc JOIN cells ce
           ON ce.cell = qc.qcell AND ce.vec_id <> qc.qid
           WHERE qc.rn <= $p),
         adcR$p AS (SELECT ca.qid, ca.neighbor_id,
             list_reduce(list(l.d ORDER BY l.s), (a, b) -> a + b) AS dist
           FROM candR$p ca
           JOIN rcodes c ON c.vec_id = ca.neighbor_id
           JOIN rlut l ON l.qid = ca.qid AND l.qcell = ca.qcell
             AND l.s = c.s AND l.code = c.code
           GROUP BY ca.qid, ca.neighbor_id),
         topR$p AS (SELECT qid, neighbor_id FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY dist ASC, neighbor_id ASC) AS rank FROM adcR$p)
           WHERE rank <= 10),
         hitR$p AS (SELECT tr.qid,
             CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit
           FROM truth tr LEFT JOIN topR$p a
           ON a.qid = tr.qid AND a.neighbor_id = tr.nid
           GROUP BY tr.qid)"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ───── iterated BPE tokenizer training: 3 greedy merge rounds over
    // the documents corpus, each applied before the next is counted —
    // x53 frozen at one step becomes the actual training loop. Driver
    // state per round = one (a, b) pair; every corpus pass is a narrow
    // codegen'd projection (see TextOps.bpeTrain)
    "x150_bpe_train" -> ((s, d) =>
      TextOps.bpeTrain(t(s, d, "documents"), "doc_id", "text", nMerges = 3)),

    // ───── maintained ANN index replayed as batch increments: seed the
    // standing cell index from 3/4 of the corpus (model = frozen
    // data-pick centroids FROM THE SEED, the x15 convention restricted
    // to what the seed has seen), then upsert three arriving batches —
    // with one REDELIVERED batch that must append nothing — and emit the
    // final persisted index state. The oracle recomputes the assignment
    // of every vector under the same frozen model: any duplicate append,
    // dropped row, or drift between the incremental and batch assignment
    // paths shows up as a row/hash mismatch. (The streaming face of the
    // same functions — MemoryStream micro-batches — is proven ≡ batch
    // ivfTopK in StreamsSpec; this catalog entry pins the state algebra
    // under the driver's oracle.)
    "x151_ann_index_upsert" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id").isNotNull)
      val seed = emb.filter(col("vec_id") % 4 =!= 0)
      val cent = seed.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ann_idx").toString
      Streams.seedAnnIndex(seed, "vec_id", "embedding",
        cent, "cid", "cvec", dir)
      val b1 = emb.filter(col("vec_id") % 12 === 0)
      val b2 = emb.filter(col("vec_id") % 12 === 4)
      val b3 = emb.filter(col("vec_id") % 12 === 8)
      // b1 again between b2 and b3: a pure redelivery that must no-op
      Seq(b1, b2, b1, b3).foreach(b =>
        Streams.incrementalAnnStep(b, "vec_id", "embedding", dir))
      s.read.parquet(s"$dir/cells")
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          when(col("vec_id") % 4 =!= 0, "seed")
            .when(col("vec_id") % 12 === 0, "b1")
            .when(col("vec_id") % 12 === 4, "b2")
            .otherwise("b3").as("phase"))
    }),

    // ───── multi-probe recall curves for BOTH IVF-PQ encodings at the
    // same fixed codebook budget (16 coarse cells, m=8 subspaces):
    // recall@10 against EXACT squared-L2 ground truth at probes ∈
    // {1, 2, 4}, scheme ∈ {abs = x122's absolute codes, residual =
    // x123's IVFADC). The curves are the r7 directive-#7 evidence, and
    // they carry an honest negative worth pinning: with ABSOLUTE codes
    // multi-probe DEGRADES recall on this data (4.125 → 4.0 → 3.5 mean
    // hits at sf0.01) — the coarse centroids double as the PQ codebook,
    // so foreign-cell candidates arrive with ADC error comparable to
    // the inter-cell distances and displace true neighbors — while
    // RESIDUAL codes refine within-cell geometry, which is exactly what
    // makes extra probes pay (Jégou '11's reason for IVFADC). Ground
    // truth is cached once and reused across all six settings
    "x152_multiprobe_recall" -> ((s, d) => {
      graft.expressions.GraftFunctions.ensureRegistered(s)
      val emb = t(s, d, "embeddings")
      val cent = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val fine = Similarity.residuals(
          emb.filter(col("vec_id") >= 16 && col("vec_id") < 32),
          "vec_id", "embedding", cent, "cid", "cvec")
        .select(col("vec_id").as("fcid"), col("resid").as("fvec"))
      val qs = emb.filter(col("vec_id") < 8)
      val qb = broadcast(qs.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("__qv")))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("__d2").asc, col("vec_id").asc)
      val truth = InternalCaches.register(
        emb.select(col("vec_id"),
            col("embedding").cast("array<double>").as("__v"))
          .crossJoin(qb).filter(col("qid") =!= col("vec_id"))
          .withColumn("__d2", expr(
            """aggregate(zip_with(__qv, __v, (a, b) -> (a - b) * (a - b)),
               CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"""))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= 10)
          .select(col("qid"), col("vec_id").as("nid")))
      // each scheme scores ONCE at max(probes) (the sweep operators carry
      // the probed cell's rank), so the whole 6-curve query pays two ADC
      // passes, not six
      val probes = Seq(1, 2, 4)
      val truthP = truth.select(col("qid"), col("nid"),
        explode(typedLit(probes.map(_.toLong))).as("probes"))
      def recallOf(scheme: String, sweep: DataFrame): DataFrame =
        truthP.join(
            sweep.select(col("probes"), col("query_id").as("qid"),
              col("neighbor_id").as("nid"), lit(true).as("__hit")),
            Seq("probes", "qid", "nid"), "left")
          .groupBy(col("probes"), col("qid"))
          .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hit"))
          .select(lit(scheme).as("scheme"), col("probes"), col("qid"),
            col("n_hit"), (col("n_hit").cast("double") / 10).as("recall"))
      recallOf("abs", Similarity.ivfPqSweepTopK(emb, "vec_id", "embedding",
          cent, "cid", "cvec", qs, "vec_id", "embedding",
          m = 8, dim = 64, k = 10, probes = probes))
        .unionByName(recallOf("residual", Similarity.ivfPqResidualSweepTopK(
          emb, "vec_id", "embedding", cent, "cid", "cvec",
          fine, "fcid", "fvec", qs, "vec_id", "embedding",
          m = 8, dim = 64, k = 10, probes = probes)))
    }))

  val oracle: Map[String, String] = Map(
    "x150_bpe_train" ->
      s"""WITH c0 AS (SELECT doc_id, ${normOf("text")} AS s FROM documents
           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         ${bpeRoundSql(1, "c0")},
         ${bpeRoundSql(2, "c1")},
         ${bpeRoundSql(3, "c2")}
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS step, a || '_' || b AS pr,
             n AS n_occ, (SELECT nt FROM t1) AS n_tokens_after FROM m1
           UNION ALL SELECT CAST(2 AS BIGINT), a || '_' || b, n,
             (SELECT nt FROM t2) FROM m2
           UNION ALL SELECT CAST(3 AS BIGINT), a || '_' || b, n,
             (SELECT nt FROM t3) FROM m3)""",
    // x151: every vector's nearest frozen-seed centroid (cosine desc,
    // lowest cid) — seed + three appends + a no-op redelivery must land
    // exactly here
    "x151_ann_index_upsert" ->
      s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id IS NOT NULL),
         cent AS (SELECT vec_id AS cid, v AS cv FROM ev
           WHERE vec_id < 16 AND vec_id % 4 <> 0),
         assign AS (SELECT e.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
           FROM ev e, cent c)
         SELECT vec_id, CAST(cid AS BIGINT) AS cell,
           CASE WHEN vec_id % 4 <> 0 THEN 'seed'
                WHEN vec_id % 12 = 0 THEN 'b1'
                WHEN vec_id % 12 = 4 THEN 'b2'
                ELSE 'b3' END AS phase
         FROM assign WHERE rn = 1""",
    // x152: x122's probe-independent CTEs + exact-L2 truth, then the
    // candidate/ADC/top-10/hit chain once per probe setting
    "x152_multiprobe_recall" ->
      s"""WITH ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent AS (SELECT vec_id AS cid, v AS cv FROM ev WHERE vec_id < 16),
         assign AS (SELECT e.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ${cosSql("e.v", "c.cv")} DESC, c.cid) AS rn
           FROM ev e, cent c),
         cells AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
         sub AS (SELECT e.vec_id, s.s, c.cid,
             list_inner_product(
               list_transform(range(8), i -> e.v[s.s*8 + i + 1] - c.cv[s.s*8 + i + 1]),
               list_transform(range(8), i -> e.v[s.s*8 + i + 1] - c.cv[s.s*8 + i + 1])) AS d
           FROM ev e, range(0, 8) s(s), cent c),
         codes AS (SELECT vec_id, s, cid AS code FROM (
             SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                 ORDER BY d ASC, cid ASC) AS rn
             FROM sub)
           WHERE rn = 1),
         lut AS (SELECT vec_id AS qid, s, cid AS code, d FROM sub
           WHERE vec_id < 8),
         truth AS (SELECT qid, nid FROM (
             SELECT q.vec_id AS qid, e.vec_id AS nid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_inner_product(
                   list_transform(range(64), i -> q.v[i + 1] - e.v[i + 1]),
                   list_transform(range(64), i -> q.v[i + 1] - e.v[i + 1])) ASC,
                 e.vec_id ASC) AS rn
             FROM ev e, (SELECT * FROM ev WHERE vec_id < 8) q
             WHERE e.vec_id <> q.vec_id)
           WHERE rn <= 10),
         resid AS (SELECT e.vec_id, ce.cell,
             list_transform(range(64), i -> e.v[i + 1] - c.cv[i + 1]) AS rv
           FROM ev e JOIN cells ce USING (vec_id) JOIN cent c ON c.cid = ce.cell),
         fine AS (SELECT vec_id AS fcid, rv AS fv FROM resid
           WHERE vec_id >= 16 AND vec_id < 32),
         rsub AS (SELECT r.vec_id, s.s, f.fcid,
             list_inner_product(
               list_transform(range(8), i -> r.rv[s.s*8 + i + 1] - f.fv[s.s*8 + i + 1]),
               list_transform(range(8), i -> r.rv[s.s*8 + i + 1] - f.fv[s.s*8 + i + 1])) AS d
           FROM resid r, range(0, 8) s(s), fine f),
         rcodes AS (SELECT vec_id, s, fcid AS code FROM (
             SELECT vec_id, s, fcid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                 ORDER BY d ASC, fcid ASC) AS rn
             FROM rsub)
           WHERE rn = 1),
         qca AS (SELECT vec_id AS qid, cid AS qcell, rn FROM assign
           WHERE vec_id < 8 AND rn <= 4),
         qres AS (SELECT qc.qid, qc.qcell,
             list_transform(range(64), i -> e.v[i + 1] - c.cv[i + 1]) AS rv
           FROM qca qc JOIN ev e ON e.vec_id = qc.qid
           JOIN cent c ON c.cid = qc.qcell),
         rlut AS (SELECT q.qid, q.qcell, s.s, f.fcid AS code,
             list_inner_product(
               list_transform(range(8), i -> q.rv[s.s*8 + i + 1] - f.fv[s.s*8 + i + 1]),
               list_transform(range(8), i -> q.rv[s.s*8 + i + 1] - f.fv[s.s*8 + i + 1])) AS d
           FROM qres q, range(0, 8) s(s), fine f),
         ${probeBlockSql(1)},
         ${probeBlockSql(2)},
         ${probeBlockSql(4)},
         ${probeResidualBlockSql(1)},
         ${probeResidualBlockSql(2)},
         ${probeResidualBlockSql(4)}
         SELECT * FROM (
           SELECT 'abs' AS scheme, CAST(1 AS BIGINT) AS probes, qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 AS recall FROM hit1
           UNION ALL SELECT 'abs', CAST(2 AS BIGINT), qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 FROM hit2
           UNION ALL SELECT 'abs', CAST(4 AS BIGINT), qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 FROM hit4
           UNION ALL SELECT 'residual', CAST(1 AS BIGINT), qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 FROM hitR1
           UNION ALL SELECT 'residual', CAST(2 AS BIGINT), qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 FROM hitR2
           UNION ALL SELECT 'residual', CAST(4 AS BIGINT), qid, n_hit,
             CAST(n_hit AS DOUBLE) / 10 FROM hitR4)""")
}
