package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** The EXECUTOR half of the S4/S6 ingestion seam, made concrete. The
  * planners ([[SyncPlan.sheetsExportPlan]], [[SyncPlan.driveSyncPlan]])
  * produce deterministic plan rows in-engine; this runs the fetch over
  * those rows with a pluggable transport — the deployment wires an HTTP
  * or Drive client where the reference loops `requests.get`
  * (`episode_stats/episode_stats_extract.py:55-66`) and
  * `GetContentFile` (`confessional/confessional_extract.py:103-193`);
  * the sandbox (and the specs) wire a stub.
  *
  * Scale/replay posture:
  *  - `foreachPartition` distributes the download list cluster-wide — a
  *    million-file bronze sync is one task per partition of plan rows,
  *    never a driver loop.
  *  - Each fetch wraps in [[graft.ops.Retry.withRetry]] (exponential
  *    backoff, deterministic jitter seeded per dest file so a fleet of
  *    workers de-synchronizes but a replay sleeps the same schedule).
  *  - The sink is IDEMPOTENT (write-to-temp + atomic replace), so a
  *    Spark task retry — which replays the whole partition, including
  *    fetches that already landed — converges to the same bronze state,
  *    the same reason the K1 upsert makes load replays free.
  */
object PlanExecutor {

  /** Fetch the bytes behind a plan row's key (an export URL, a Drive
    * file title — whatever column the caller points at). Ships to
    * executors, so implementations must be Serializable and
    * thread-safe. */
  trait Transport extends Serializable {
    def fetch(key: String): Array[Byte]
  }

  /** Executor-side landing for fetched bytes, keyed by dest file name.
    * Implementations must be idempotent under replay. */
  trait ByteSink extends Serializable {
    def write(destFile: String, bytes: Array[Byte]): Unit
  }

  /** Local/shared-filesystem bronze directory (the reference's layout):
    * write to a hidden temp name, then atomically replace the target —
    * a crashed task never leaves a torn file, and a replayed task
    * overwrites to the identical end state. */
  final case class DirSink(dir: String) extends ByteSink {
    def write(destFile: String, bytes: Array[Byte]): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val target = Paths.get(dir, destFile)
      if (target.getParent != null) Files.createDirectories(target.getParent)
      val tmp = target.resolveSibling(
        s".${target.getFileName}.${java.util.UUID.randomUUID()}.tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** Run the fetches a plan describes: for each row, `transport.fetch`
    * the `keyCol` value (retried per [[graft.ops.Retry]]) and land the
    * bytes at `destCol` via `sink`. Callers filter the plan first
    * (e.g. drop [[SyncPlan.driveSyncPlan]]'s 'skip' rows). Runs as one
    * distributed action over the plan partitions. */
  def execute(plan: DataFrame, keyCol: String, destCol: String,
              transport: Transport, sink: ByteSink,
              maxAttempts: Int = 3, baseMs: Long = 1000L,
              jitterMs: Long = 500L, seed: Long = 42L): Unit = {
    val rows = plan.select(plan.col(keyCol).cast("string"),
      plan.col(destCol).cast("string"))
    rows.foreachPartition { (it: Iterator[Row]) =>
      it.foreach { r =>
        val key = r.getString(0)
        val dest = r.getString(1)
        val bytes = graft.ops.Retry.withRetry(
          maxAttempts, baseMs, jitterMs,
          seed = seed ^ dest.hashCode.toLong)(_ => transport.fetch(key))
        sink.write(dest, bytes)
      }
    }
  }
}
