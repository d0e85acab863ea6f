package graft.ops

/** Retry policy for flaky external calls — the reference wraps its reddit
  * pull in sleep-and-retry (reddit/reddit_extract.py:67-73). Engine
  * placement: retries belong at the EXTRACT boundary (the
  * `Runner.increment` extract callback, a REST page fetch, a JDBC staging
  * write), never inside query plans — a Spark task that throws is already
  * retried by the scheduler; this is for the driver-side calls in front
  * of it.
  *
  * Exponential backoff with DETERMINISTIC jitter: the jitter term is a
  * hash of (seed, attempt), not a Random draw, so a replayed pipeline
  * sleeps the same schedule (and tests assert exact delays). Jitter
  * matters at fleet scale: a thousand workers retrying a shared endpoint
  * without it re-synchronize into thundering herds.
  */
object Retry {

  /** Delay before retry `attempt` (1-based): base·2^(attempt-1) plus up to
    * `jitterMs` of deterministic spread.
    *
    * The jitter is deterministic PER LIBRARY VERSION, not across versions:
    * it hashes (seed, attempt) with the standard-library hash, whose value
    * changed when the deprecated productHash was replaced with
    * caseClassHash. Consumers must not persist expected delay sequences —
    * replay-exactness holds within a build, which is all fleet
    * de-synchronization and the in-repo tests need. */
  def delayMs(attempt: Int, baseMs: Long, jitterMs: Long, seed: Long): Long = {
    val backoff = baseMs * (1L << math.min(attempt - 1, 20)) // cap the shift
    val h = scala.util.hashing.MurmurHash3.caseClassHash((seed, attempt))
    backoff + (if (jitterMs > 0) math.floorMod(h.toLong, jitterMs) else 0L)
  }

  /** Run `f`, retrying on exception up to `maxAttempts` total attempts.
    * `retryOn` filters retryable failures — the default retries anything
    * NonFatal, so OutOfMemoryError / InterruptedException / LinkageError
    * always propagate immediately (sleeping on a cancellation or an OOM
    * would be worse than the original failure). The last failure
    * propagates with earlier ones suppressed. `sleep` is injectable for
    * tests. */
  def withRetry[T](maxAttempts: Int, baseMs: Long = 1000L,
                   jitterMs: Long = 500L, seed: Long = 42L,
                   retryOn: Throwable => Boolean = scala.util.control.NonFatal(_),
                   sleep: Long => Unit = Thread.sleep)(f: Int => T): T = {
    require(maxAttempts >= 1)
    var last: Throwable = null
    var attempt = 1
    while (attempt <= maxAttempts) {
      try return f(attempt)
      catch {
        case e: Throwable if retryOn(e) && attempt < maxAttempts =>
          if (last != null) e.addSuppressed(last)
          last = e
          sleep(delayMs(attempt, baseMs, jitterMs, seed))
        case e: Throwable =>
          if (last != null) e.addSuppressed(last)
          throw e
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }
}
