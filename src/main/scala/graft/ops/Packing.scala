package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Bin-packing strategies for sequence-length dataloaders.
  *
  * x154 covers the concat-and-chunk (GPT-style) packing that SPLITS
  * documents across bin boundaries — a closed-form window. This file
  * holds the other production strategy: packing WITHOUT splitting, where
  * a document that does not fit in the current bin's remainder opens a
  * new bin (next-fit; the streaming special case of first-fit that a
  * sharded loader actually runs, because it never looks back at earlier
  * bins). Next-fit is inherently a sequential recurrence — bin index and
  * fill depend on every prior document's size, and the recurrence is not
  * associative (no prefix-sum trick exists: the same suffix packs
  * differently depending on the entry fill) — so the scale shape is
  * "sequential within a group, parallel across groups", exactly like the
  * per-source windows of x136/x154: repartition by group, secondary-sort
  * within partitions, one forward pass with O(1) state per task.
  *
  * Reference behavior mirrored: the reference pipeline's row-order
  * accumulation loops (survivor_processing process_data.py:61-103 walks
  * rows in order carrying running state); re-expressed here as a
  * distributed secondary-sort scan instead of a driver loop.
  */
object Packing {

  /** Next-fit packing of `sizeCol`-sized items into `capacity`-token
    * bins, independently per `groupCol`, in ascending `orderCol` order.
    *
    * Rule per item: if the current bin is non-empty and the item does
    * not fit in its remainder, close it and open the next bin; the item
    * is placed at the bin's current fill. An item larger than `capacity`
    * occupies a bin of its own (it enters an empty bin unconditionally,
    * and the next item necessarily opens a new one) — no truncation, so
    * `bin_offset + size` may exceed `capacity` only for oversized items.
    *
    * Output columns: groupCol, orderCol, sizeCol (all pass-through),
    * `bin_idx` (0-based per group), `bin_offset` (fill before placement).
    *
    * Scale: one shuffle (repartition by group), then a per-partition
    * sorted forward scan via mapPartitions with constant state — no
    * collect, no per-group materialization, state is (group, bin, fill).
    * Skew bound = the largest single group, the same bound every
    * per-source window in the catalog already carries.
    */
  def nextFitPack(df: DataFrame, groupCol: String, orderCol: String,
                  sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val prepared = df
      .select(col(groupCol).cast(StringType).as("__g"),
        col(orderCol).cast(LongType).as("__o"),
        col(sizeCol).cast(LongType).as("__n"))
      .repartition(col("__g"))
      .sortWithinPartitions(col("__g"), col("__o"))
    val outSchema = StructType(Seq(
      StructField(groupCol, StringType, nullable = true),
      StructField(orderCol, LongType, nullable = true),
      StructField(sizeCol, LongType, nullable = true),
      StructField("bin_idx", LongType, nullable = false),
      StructField("bin_offset", LongType, nullable = false)))
    val packed = prepared.mapPartitions { rows =>
      var curGroup: String = null
      var bin = 0L
      var fill = 0L
      rows.map { r =>
        val g = r.getString(0)
        val o = r.getLong(1)
        val n = r.getLong(2)
        if (g != curGroup) { curGroup = g; bin = 0L; fill = 0L }
        if (fill > 0 && fill + n > capacity) { bin += 1; fill = 0L }
        val off = fill
        fill += n
        Row(g, o, n, bin, off)
      }
    }(ExpressionEncoder(outSchema))
    packed
  }
}
