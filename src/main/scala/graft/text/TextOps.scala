package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: normalization,
  * tokenization, shingling, language-ID, quality scoring, fingerprinting.
  *
  * All column-expression based (no UDFs) so everything stays inside
  * whole-stage codegen and runs at scan speed on 100 TB — these are the
  * operators you run over every document exactly once, so per-row cost is
  * the whole ballgame.
  */
object TextOps {

  /** Canonical normalization: lowercase, strip non-alphanumerics to spaces,
    * collapse runs of whitespace, trim. The shared preprocessing for
    * dedup/fingerprint/langid so they agree on token boundaries. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9]+", " "), " +", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column =
    split(normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword count: alphabetic runs are charged ceil(len/4) subword
    * units (a cheap stand-in for a real BPE vocab — the point is the Spark
    * plumbing: a deterministic per-document cost model), digits and other
    * symbols one unit each. */
  def subwordCount(text: Column): Column = {
    val words = split(normalize(text), " ")
    // aggregate over the token array: sum of ceil(length/4), min 1 per token
    aggregate(
      filter(words, w => length(w) > 0),
      lit(0L),
      (acc, w) => acc + greatest(ceil(length(w) / lit(4.0)).cast("long"), lit(1L)))
  }

  /** Word k-shingles of the normalized text (for MinHash / Jaccard).
    * Returns the DISTINCT shingle set, joined with '_'. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    array_distinct(
      transform(
        sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws("_", slice(toks, i + 1, lit(k)))))
  }

  /** Stopword-profile language ID (SURVEY §7.1 step 7 extension).
    * Scores each candidate language by how many of the document's tokens
    * appear in its (tiny, embedded) stopword list; argmax wins, ties broken
    * alphabetically. A real system would use char-n-gram profiles; the
    * operator shape (per-token broadcast-set membership + argmax) is the
    * same and it's what the oracle can verify. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "una", "es", "que", "para"),
    "de" -> Seq("der", "die", "das", "und", "von", "ein", "eine", "ist", "dass", "zu"))

  def langScore(text: Column, lang: String): Column = {
    val sw = stopwords(lang).map(lit(_))
    size(filter(tokens(text), t => array_contains(array(sw: _*), t)))
  }

  /** Argmax language with deterministic alphabetical tiebreak; "und"
    * (undetermined) when no stopword hits at all. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(langScore(text, l).as("s"), lit(l).as("l")))
    // array_max over (score, lang) structs picks highest score; for equal
    // scores it picks the lexicographically LAST lang, so invert: compare on
    // (score, negated-rank) … simpler: fold with explicit strictly-greater.
    val best = scored.reduce { (a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a)
    }
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Quality-score components (all exact integer-ratio arithmetic →
    * deterministic doubles). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  def stopwordRatio(text: Column): Column = {
    val all = stopwords.values.flatten.toSeq.distinct.sorted.map(lit(_))
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => array_contains(array(all: _*), t))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: rewards mid-length documents with
    * low punctuation/digit noise and a natural stopword rate. Weights are
    * arbitrary but fixed; the operator is the deliverable. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(400.0), lit(1.0))
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val digit = lit(1.0) - least(digitRatio(text) * 5.0, lit(1.0))
    lenScore * 0.4 + punct * 0.3 + digit * 0.3
  }

  /** Content fingerprint = md5 of the normalized text: exact-dup clustering
    * key that survives whitespace/case/punctuation noise. */
  def fingerprint(text: Column): Column =
    md5(normalize(text))

  /** Rolling polynomial fingerprint (Rabin-Karp style, base 31 mod the
    * Mersenne prime 2^31-1 — headroom-safe under ANSI long arithmetic)
    * over normalized tokens — a cheap order-sensitive signature used where
    * md5 of the whole text is too strict (e.g. windowed chunk fingerprints).
    * Built-ins only: aggregate over the token array.
    * NOTE: not oracle-checkable (DuckDB lacks the same fold) — covered by
    * unit tests instead. */
  def rollingFingerprint(text: Column): Column = {
    val mod = lit(2147483647L) // 2^31-1; acc*31 + crc32 < 2^38, no overflow
    aggregate(
      tokens(text),
      lit(7L),
      (acc, t) => pmod(acc * 31 + crc32(t.cast("binary")), mod))
  }
}
