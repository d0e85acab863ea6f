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

  /** The one output schema both packers share (ADVICE r10: the two had
    * drifted on sizeCol nullability). Pass-through columns are non-null
    * by construction — null group/order/size rows are filtered up
    * front. */
  private def packedSchema(groupCol: String, orderCol: String,
                           sizeCol: String): StructType = StructType(Seq(
    StructField(groupCol, StringType, nullable = false),
    StructField(orderCol, LongType, nullable = false),
    StructField(sizeCol, LongType, nullable = false),
    StructField("bin_idx", LongType, nullable = false),
    StructField("bin_offset", LongType, nullable = false)))

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
    * Rows with a null group, order, or size are DROPPED up front — a
    * null has no position in the order and no width, so it cannot be
    * packed; without the filter the scan would die mid-task with an
    * opaque NPE (catalog entries pre-filter, the public API must not
    * rely on that).
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
    val prepared = df
      .select(col(groupCol).cast(StringType).as("__g"),
        col(orderCol).cast(LongType).as("__o"),
        col(sizeCol).cast(LongType).as("__n"))
      .filter(col("__g").isNotNull && col("__o").isNotNull
        && col("__n").isNotNull)
      .repartition(col("__g"))
      .sortWithinPartitions(col("__g"), col("__o"))
    val outSchema = packedSchema(groupCol, orderCol, sizeCol)
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

  /** Bounded-pool best-fit packing: next-fit's utilization upgrade, the
    * "packing buffer" a production dataloader keeps (seqio-style). Up to
    * `pool` bins stay open per group; each item goes to the FULLEST open
    * bin it fits in (ties to the lowest bin id). If none fits and the
    * pool has room, a fresh bin opens; if the pool is full, the fullest
    * bin (ties to the lowest id) is closed to make room. An item larger
    * than `capacity` enters a fresh bin unconditionally (no truncation),
    * exactly like [[nextFitPack]]. `pool = 1` IS next-fit: the single
    * open bin either fits the item or is evicted for a fresh one
    * (PackingSpec pins the equivalence as a law).
    *
    * Output: groupCol, orderCol, sizeCol, `bin_idx` (0-based per group,
    * in OPEN order — not close order), `bin_offset`. Null group/order/
    * size rows are dropped up front, exactly as in [[nextFitPack]].
    *
    * Scale: identical shape to [[nextFitPack]] — one shuffle, secondary
    * sort, forward scan; state grows from three words to `pool` (bin,
    * fill) pairs per task, still O(1) in the data. The recurrence is as
    * non-associative as next-fit's (more so: placement depends on the
    * whole pool), so the same no-closed-form argument applies. */
  def bestFitPack(df: DataFrame, groupCol: String, orderCol: String,
                  sizeCol: String, capacity: Long, pool: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(pool > 0, s"pool must be positive, got $pool")
    val prepared = df
      .select(col(groupCol).cast(StringType).as("__g"),
        col(orderCol).cast(LongType).as("__o"),
        col(sizeCol).cast(LongType).as("__n"))
      .filter(col("__g").isNotNull && col("__o").isNotNull
        && col("__n").isNotNull)
      .repartition(col("__g"))
      .sortWithinPartitions(col("__g"), col("__o"))
    val outSchema = packedSchema(groupCol, orderCol, sizeCol)
    val packed = prepared.mapPartitions { rows =>
      var curGroup: String = null
      var nextBin = 0L
      // open pool: parallel arrays of (bin id, fill), size ≤ pool
      val bins = new scala.collection.mutable.ArrayBuffer[(Long, Long)](pool)
      rows.map { r =>
        val g = r.getString(0)
        val o = r.getLong(1)
        val n = r.getLong(2)
        if (g != curGroup) { curGroup = g; nextBin = 0L; bins.clear() }
        // best fit: fullest open bin the item fits in, ties → lowest id
        var best = -1
        var i = 0
        while (i < bins.length) {
          if (bins(i)._2 + n <= capacity &&
              (best < 0 || bins(i)._2 > bins(best)._2 ||
                (bins(i)._2 == bins(best)._2 && bins(i)._1 < bins(best)._1)))
            best = i
          i += 1
        }
        val (bin, off) =
          if (best >= 0) {
            val (b, f) = bins(best)
            bins(best) = (b, f + n)
            (b, f)
          } else {
            if (bins.length == pool) {
              // evict the fullest (ties → lowest id) to make room
              var ev = 0
              var j = 1
              while (j < bins.length) {
                if (bins(j)._2 > bins(ev)._2 ||
                    (bins(j)._2 == bins(ev)._2 && bins(j)._1 < bins(ev)._1))
                  ev = j
                j += 1
              }
              bins.remove(ev): Unit
            }
            val b = nextBin
            nextBin += 1
            bins.append((b, n))
            (b, 0L)
          }
        Row(g, o, n, bin, off)
      }
    }(ExpressionEncoder(outSchema))
    packed
  }
}
