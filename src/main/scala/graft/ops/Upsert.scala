package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert (SURVEY §2.2 K1; reference `helpers/load_helpers.py:4-39` —
  * temp-table + `INSERT … ON CONFLICT (keys) DO UPDATE`).
  *
  * Two faces:
  *
  *  1. [[merge]] — the set semantics, engine-side: given the current table
  *     state and an updates batch, produce the post-upsert state. Updates
  *     win on key collision; within the updates batch the latest row under
  *     `updateTiebreak` wins (the reference's batch is already deduped by
  *     construction). This is what `MERGE INTO` computes, expressed as a
  *     plan so it can be tested and oracle-checked.
  *
  *  2. For real sinks: parquet/lakehouse targets rewrite via
  *     `merge(current, updates, keys).write`; JDBC targets should write the
  *     updates batch to a temp table and issue the reference's
  *     `ON CONFLICT` statement driver-side (no per-row round trips).
  *
  * Scale: one shuffle of each side on the key columns; the anti-join and
  * the union reuse the same hash partitioning. Idempotent by construction:
  * merge(merge(t, u), u) == merge(t, u)  (property-tested).
  */
object Upsert {

  def merge(
      current: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      updateTiebreak: Seq[Column] = Nil): DataFrame = {
    // default tiebreak = every non-key column: with duplicate keys in the
    // batch the survivor must still be a deterministic function of the row
    // multiset, or replays stop being no-ops (keys alone tie on every row)
    val tb =
      if (updateTiebreak.nonEmpty) updateTiebreak
      else {
        // maps are unorderable — skip them (and fall back to keys when
        // nothing orderable remains; duplicate keys then need an explicit
        // tiebreak for determinism)
        val orderable = updates.schema.fields
          .filterNot(f => keys.contains(f.name))
          .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
          .map(f => col(f.name)).toSeq
        if (orderable.nonEmpty) orderable else keys.map(col)
      }
    // latest-wins dedup inside the batch, deterministic
    val upd = Relational.dedupByKeys(updates, keys, tb.map(_.desc))
    val kept = current.join(upd.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(upd.select(current.columns.map(col).toSeq: _*))
  }
}
