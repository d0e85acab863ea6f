package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for CPU-dense repartitions (guide §2: derive
  * partitioning from the input size, never from a constant tuned to one
  * deployment).
  *
  * The engine's similarity/training kernels rebalance a narrow projection
  * across the cluster before a CPU-dense per-row pass (quantize + argmin,
  * norm folds, PQ encodes). The r1–r16 form used
  * `repartition(defaultParallelism)` — correct at scale, where every core
  * holds MBs of rows, but at the other extreme it shreds a KB-scale frame
  * into `cores` near-empty tasks, and the per-task fixed cost (task
  * launch, codegen instantiation, cached-batch decode, allocator setup)
  * then DOMINATES: the r16 driver measured the k-means family 1.8–2.4×
  * FASTER at 8 cores than 32 (PERF_r16.scaling x129 0.41, x130 0.53), and
  * the same pass over the 2000-row sf0.1 embeddings burns 4.2 CPU-s as 32
  * tasks vs 0.4 CPU-s as 8 (StageCensus r17).
  *
  * [[sizeAdaptive]] caps the fan-out by the plan-statistics input size:
  * one partition per `targetBytes` of estimated input, never more than
  * `defaultParallelism` (so at production sizes the count is IDENTICAL to
  * the old form — this only stops the small-frame shredding), never less
  * than 1. Statistics come from the optimized logical plan (file sizes
  * for scans, propagated estimates above them; unknown sizes estimate
  * huge, which degrades safely to the old `defaultParallelism`).
  */
object Partitioning {

  /** Default per-partition input target for CPU-dense rebalances: small
    * enough that a few MB of input still fans out across several cores,
    * large enough that per-task fixed costs stay amortized. Deployments
    * whose kernels are heavier per byte (or boxes with slower cores) can
    * lower it per call. */
  val CpuDenseTargetBytes: Long = 4L << 20

  /** Partition count for a CPU-dense rebalance of `df`:
    * `clamp(ceil(estimatedBytes / targetBytes), 1, defaultParallelism)`. */
  def sizeAdaptive(df: DataFrame,
                   targetBytes: Long = CpuDenseTargetBytes): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val dp = df.sparkSession.sparkContext.defaultParallelism.max(1)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val want = (bytes + targetBytes - 1) / targetBytes
    want.min(BigInt(dp)).max(BigInt(1)).toInt
  }
}
