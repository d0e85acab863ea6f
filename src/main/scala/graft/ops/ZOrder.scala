package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping — the
  * layout tool behind "this scan filters on TWO columns and neither sort
  * order alone prunes". Interleaving the bucket bits of both dimensions
  * into one key and range-writing on it makes every parquet row group a
  * small rectangle in (x, y) space, so a two-dimensional box predicate
  * touches only the row groups whose min/max stats intersect the box —
  * the reader skips the rest (ZOrderSpec measures the pruning via scan
  * metrics against an unsorted twin of the same data).
  *
  * The key formula is integer-exact and engine-portable (div/%/shiftleft
  * only — the same expression x82 oracles against DuckDB): bit i of `xb`
  * lands at z bit 2i, bit i of `yb` at 2i+1.
  */
object ZOrder {

  /** Morton key of two bucketized dimensions (values in [0, 2^bits)) —
    * bits interleaved x-low: z = …y1x1y0x0. Callers bucketize first
    * (e.g. `least(n_chars div 64, 255)`): z-ordering operates on COARSE
    * buckets, fine-grained ordering inside a bucket adds nothing to
    * row-group stats. */
  def zKey(xb: Column, yb: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(xb.cast("long"), i) % 2, 2 * i) +
        shiftleft(shiftright(yb.cast("long"), i) % 2, 2 * i + 1)
    }.reduce(_ + _).cast("long")
  }

  /** Write `df` z-clustered to parquet: range-partition on the z key into
    * `numFiles` output files, sort rows within each by z, drop the key
    * (it is derivable). Every file then covers one contiguous z range and
    * each of its row groups a rectangle of (x, y) space — the layout the
    * parquet reader's min/max row-group pruning needs. At 100 TB this is
    * the table-maintenance job that runs once per ingest window, not per
    * query; `numFiles` should target the usual 128 MB–1 GB file size. */
  def writeZOrdered(df: DataFrame, zCol: Column, numFiles: Int,
                    path: String): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
