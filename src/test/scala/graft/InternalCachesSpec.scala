package graft

import graft.ops.InternalCaches
import graft.text.TextOps
import org.apache.spark.sql.functions._

class InternalCachesSpec extends SparkSpec {
  import spark.implicits._

  test("register pins, drain releases, results unaffected") {
    InternalCaches.drain()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val pinned = InternalCaches.register(df)
    assert(InternalCaches.pinned == 1)
    assert(pinned.storageLevel.useMemory, "register must cache")
    assert(pinned.count() == 2)
    InternalCaches.drain()
    assert(InternalCaches.pinned == 0)
    assert(pinned.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "drain must unpersist")
    assert(pinned.count() == 2, "unpersisted frame still recomputes correctly")
  }

  test("an operator with an internal pin registers it and survives a drain") {
    InternalCaches.drain()
    val docs = Seq((1L, "the cat sat"), (2L, "the cat sat"), (3L, "dog"))
      .toDF("doc_id", "text")
    val out = TextOps.nbLangId(docs, "doc_id", "text", "text",
      col("doc_id") <= 2L)
    assert(InternalCaches.pinned >= 1,
      "nbLangId's token-rows pin must be registered")
    assert(out.count() == 3)
    InternalCaches.drain()
    assert(InternalCaches.pinned == 0)
    // post-drain re-execution recomputes the token frame — same answer
    assert(out.count() == 3)
  }

  test("drain is idempotent and safe on an empty registry") {
    InternalCaches.drain()
    InternalCaches.drain()
    assert(InternalCaches.pinned == 0)
  }
}
