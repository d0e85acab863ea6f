package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for the engine's INTERNAL cache pins.
  *
  * Several operators pin an intermediate frame that the RETURNED plan
  * references more than once (minhash signature frames, shingle postings,
  * within-cell norm frames, NB token rows): unpersisting before return
  * would defeat the reuse, but nothing handed the caller a handle either,
  * so the documented "caller-managed lifecycle" was unachievable — tests
  * and long-lived sessions had to fall back to the blunt
  * `spark.catalog.clearCache()` (r7 ADVICE). Every internal `.cache()`
  * now routes through [[register]], and a consumer that has materialized
  * a result calls [[drain]] to release exactly the engine's pins —
  * without nuking caches the CALLER owns, which `clearCache()` does.
  *
  * `graft.Verify` / `graft.Bench` drain between queries; ScalaTest specs
  * drain in `afterEach`. Driver-side footprint is a queue of STRONG
  * DataFrame handles bounded by pins-since-last-drain — plan objects, not
  * data; a drain releases both the executor storage and the handles.
  */
object InternalCaches {

  /** Postfix sugar so query builders can write `frame.cacheRegistered`
    * where they previously wrote `frame.cache()` — every engine-internal
    * pin routes through [[register]] and is released by the next
    * [[drain]]. Import `InternalCaches.CacheSyntax`. */
  implicit class CacheSyntax(private val df: DataFrame) extends AnyVal {
    def cacheRegistered: DataFrame = InternalCaches.register(df)
  }
  private val reg = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and record the pin for a later [[drain]]. */
  def register(df: DataFrame): DataFrame = {
    val cached = df.cache()
    reg.add(cached)
    cached
  }

  /** Unpersist every registered pin (non-blocking) and clear the registry.
    * Safe to call at any time: an already-unpersisted or clearCache()'d
    * frame unpersists as a no-op. */
  def drain(): Unit = {
    var d = reg.poll()
    while (d != null) {
      try d.unpersist(blocking = false)
      catch { case _: IllegalStateException => () } // stopped SparkContext
      d = reg.poll()
    }
  }

  /** Number of currently-registered (undrained) pins — spec surface. */
  def pinned: Int = reg.size()

  /** Convenience for session teardown paths that also want caller caches
    * gone: drain the registry, then clear the session cache manager. */
  def drainAll(spark: SparkSession): Unit = {
    drain()
    spark.catalog.clearCache()
  }
}
