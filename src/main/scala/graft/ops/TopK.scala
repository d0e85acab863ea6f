package graft.ops

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate. `id` is the total-order tiebreak so results
  * are engine-independent even under duplicate scores. */
case class Scored(score: Long, id: String)

/** Aggregation buffer/result: at most k candidates, sorted by
  * (score DESC, id ASC). A case class (not a bare Seq) so
  * `Encoders.product` covers both the buffer and the output. */
case class ScoredTopK(items: Seq[Scored])

/** Bounded-state per-group top-k as a typed [[Aggregator]] (the "per-domain
  * cap: keep the k best documents" curation op).
  *
  * Why not a window? `row_number().over(partitionBy(g).orderBy(score))`
  * shuffles and SORTS every row of every group — at 100 TB a hot domain's
  * full contents flow through one task's sort. This aggregator keeps ≤ k
  * rows of state per group and combines map-side (`udaf` lowers it to a
  * `TypedImperativeAggregate`, so the buffer lives as a deserialized object
  * inside ObjectHashAggregate and is serialized only for the partial-agg
  * shuffle): each map task ships at most k rows per group, the classic
  * mergeable-summary shape. `reduce`/`merge` keep the buffer sorted by
  * (score DESC, id ASC) and truncated, so the result is deterministic and
  * merge-order-independent (proved in TopKSpec).
  *
  * The same structure is a bottom-k sketch: pass score = ~xxhash64(id)
  * (monotone negation) and the kept ids are a mergeable uniform sample —
  * see CurationQueries x56.
  */
class TopKByScore(k: Int) extends Aggregator[Scored, ScoredTopK, ScoredTopK] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: ScoredTopK = ScoredTopK(Vector.empty)

  override def reduce(buf: ScoredTopK, a: Scored): ScoredTopK = {
    val items = buf.items
    if (items.length >= k && !beats(a, items.last)) buf
    else {
      val (hi, lo) = items.span(beats(_, a))
      ScoredTopK(((hi :+ a) ++ lo).take(k))
    }
  }

  // both sides are sorted and ≤ k long: a bounded merge-sort step
  override def merge(b1: ScoredTopK, b2: ScoredTopK): ScoredTopK =
    ScoredTopK(b2.items.foldLeft(b1)(reduce).items)

  override def finish(r: ScoredTopK): ScoredTopK = r

  override def bufferEncoder = Encoders.product[ScoredTopK]
  override def outputEncoder = Encoders.product[ScoredTopK]
}

object TopK {
  /** Untyped column form: `topK(5)(col("score"), col("id"))` aggregates to
    * a `ScoredTopK` struct; explode `.items` for one row per kept id. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKByScore(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }
}
