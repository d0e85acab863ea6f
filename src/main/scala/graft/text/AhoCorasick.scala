package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Multi-pattern substring search: the classic Aho–Corasick automaton
  * (goto/fail/output links, BFS-built), for blocklist scans over a corpus
  * — PII lexicons, toxicity phrases, licensing boilerplate.
  *
  * The scale contract: ONE pass over each document's characters counts
  * every occurrence of EVERY pattern (overlapping included — each match
  * position reports), versus k regex/contains passes for a k-pattern
  * list. The automaton is built once on the driver from the (bounded)
  * pattern list, broadcast, and applied as a per-partition map — no
  * shuffle anywhere in the scan.
  *
  * Matching is exact-case over exact characters (normalize upstream if
  * needed); counts are per pattern INDEX in the constructor order, so
  * duplicate patterns each report their own count.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")

  // trie as growable parallel arrays; transitions in per-node hash maps
  // (alphabet-agnostic — fine for bounded lexicons; specialize to dense
  // arrays if the alphabet is known small)
  private val next = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val fail = mutable.ArrayBuffer(0)
  // pattern indexes ending at this node (dedup'd trie: several equal
  // patterns share an end node and each index is recorded)
  private val ends = mutable.ArrayBuffer(List.empty[Int])
  // suffix-output link: nearest fail-ancestor that ends ≥ 1 pattern
  private val out = mutable.ArrayBuffer(0)

  locally {
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += mutable.Map.empty[Char, Int]
          fail += 0; ends += Nil; out += 0
          next.length - 1
        })
      }
      ends(s) = idx :: ends(s)
    }
    // BFS fail links; root's children fail to root
    val queue = mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      out(u) = if (ends(fail(u)).nonEmpty) fail(u) else out(fail(u))
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = next(f).getOrElse(c, 0) match {
          case `v` => 0 // only possible when f == 0 and v is a root child
          case w => w
        }
        queue += v
      }
    }
  }

  /** Per-pattern occurrence counts in `text` (index-aligned with
    * `patterns`); every match position counts, overlaps included. */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    var s = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (s != 0 && !next(s).contains(c)) s = fail(s)
      s = next(s).getOrElse(c, 0)
      // walk the suffix-output chain: every pattern ending here matches
      var t = s
      while (t != 0) {
        ends(t).foreach(idx => counts(idx) += 1)
        t = out(t)
      }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Corpus blocklist scan: per-(document, pattern) occurrence counts,
    * rows only where a pattern matched. The automaton is built ONCE on
    * the driver and broadcast; the scan is a lazy mapPartitions
    * projection — text never shuffles, no per-pattern passes. Output:
    * (`idCol`, pattern, n_matches) with n_matches ≥ 1. */
  def scan(docs: DataFrame, idCol: String, textCol: String,
           patterns: Seq[String]): DataFrame = {
    val bc = docs.sparkSession.sparkContext.broadcast(new AhoCorasick(patterns))
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt,
      Encoders.scalaLong)
    docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows: Iterator[Row] =>
        rows.flatMap { r =>
          val counts = bc.value.countMatches(r.getString(1))
          counts.iterator.zipWithIndex.collect {
            case (n, i) if n > 0 => (r.getLong(0), i, n)
          }
        }
      }(enc)
      .toDF(idCol, "__pidx", "n_matches")
      .select(col(idCol),
        element_at(array(patterns.map(lit): _*), col("__pidx") + 1)
          .as("pattern"),
        col("n_matches"))
  }
}
