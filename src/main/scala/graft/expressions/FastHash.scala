package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function

/** File-wide shadow for the built-in `md5()` — import AFTER
  * `org.apache.spark.sql.functions._` and every existing `md5(...)` call
  * site in the file resolves here instead (an explicit import always wins
  * over a wildcard), swapping the expression for [[FastMd5]] without
  * touching call sites.
  *
  * Why: the built-in routes every row through
  * `MessageDigest.getInstance("MD5")` (reflective provider lookup), which
  * is the dominant — and concurrency-hostile — cost of the engine's bulk
  * hash paths (MinHash signatures at 12 md5/shingle, SimHash votes at
  * 1/token); see [[Md5Algo]] for the measurements. Values are
  * bit-identical (same MD5, same lowercase hex, null → null), so every
  * oracle-pinned output is unchanged.
  *
  * Resolution contract: `graft_md5` must be registered in the session
  * before the frame is ANALYZED. Every engine surface already guarantees
  * this — catalog queries register via `Tables.load`, the spec session
  * registers in `SparkSpec`, and `GraftSession.builder` injects the
  * extension cluster-wide. Standalone library users must call
  * `GraftFunctions.ensureRegistered(spark)` first (the existing contract
  * of every `graft_*` native).
  */
object FastHash {
  def md5(e: Column): Column = call_function("graft_md5", e)
}
