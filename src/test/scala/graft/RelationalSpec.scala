package graft

import graft.ops.{Relational, Upsert}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("conformTo adds missing as typed null, casts, drops extras") {
    val df = Seq((1L, "a", 2.5)).toDF("id", "name", "junk")
    val target = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("added", DoubleType)))
    val out = Relational.conformTo(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("id", "name", "added"))
    assert(out.schema("id").dataType == IntegerType)
    val r = out.collect().head
    assert(r.getInt(0) == 1 && r.getString(1) == "a" && r.isNullAt(2))
  }

  test("unionByNameAll reconciles mismatched columns") {
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 3.0)).toDF("id", "score")
    val u = Relational.unionByNameAll(Seq(a, b))
    assert(u.columns.toSet == Set("id", "name", "score"))
    assert(u.count() == 2)
    assert(u.filter($"id" === 2 && $"name".isNull && $"score" === 3.0).count() == 1)
  }

  test("allocateIds is deterministic: max + row_number over stable key") {
    val df = Seq(
      (Some(10L), "c"), (None, "b"), (Some(7L), "a"), (None, "d"), (None, "a2"))
      .toDF("id", "key")
    val out = Relational.allocateIds(df, "id", Seq(col("key")))
    val got = out.orderBy("key").as[(Long, String)].collect().toSeq
    // nulls ordered by key: a2->11, b->12, d->13
    assert(got == Seq((7L, "a"), (11L, "a2"), (12L, "b"), (10L, "c"), (13L, "d")))
    // re-running yields identical assignment
    val again = Relational.allocateIds(df, "id", Seq(col("key")))
      .orderBy("key").as[(Long, String)].collect().toSeq
    assert(again == got)
  }

  test("rankWithinGroups parity: two-level grouped rank matches the serial per-group row_number") {
    // the x165 contract: removing the per-group window bottleneck must
    // not move a single rank. Reference = driver-side per-group sort.
    // Few groups × many rows (the shape the op exists for), unique keys,
    // shuffled input partitioning.
    val n = 20000
    val rows = (1 to n).map { i =>
      val g = s"w${i % 7}"
      val key = (i * 2654435761L) % 1000000007L // unique per i within group
      (g, key, s"payload-$i")
    }
    val df = rows.toDF("g", "k", "p").repartition(13)
    val out = Relational.rankWithinGroups(df, Seq("g"), Seq(col("k")), "rk")
      .select($"g", $"k", $"rk").as[(String, Long, Long)].collect()
    assert(out.length == n)
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(_._2).sorted.zipWithIndex.map { case (k, i) =>
        (g, k) -> (i + 1L)
      }
    }
    out.foreach { case (g, k, rk) =>
      assert(rk == expected((g, k)), s"rank moved for ($g, $k)")
    }
    // multi-column groups resolve too (x166's (worker, source) shape)
    val out2 = Relational.rankWithinGroups(
      df.withColumn("g2", $"k" % 3), Seq("g", "g2"), Seq(col("k")), "rk")
      .groupBy($"g", $"g2").agg(max($"rk").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(out2 == 0, "per-(g,g2) ranks are not 1..n")
  }

  test("allocateIds bulk parity: two-level allocation matches the serial row_number on 10k unmatched rows") {
    // the round-6 rewrite's contract: removing the single-partition window
    // must not move a single assigned id. Reference = driver-side sort +
    // index over the null-id subset (what Window.orderBy computed).
    val n = 20000
    val rows = (1 to n).map { i =>
      val key = f"k${(i * 2654435761L) % 100000}%06d-$i" // unique, shuffled
      (if (i % 2 == 0) Some(1000000L + i) else None, key)
    }
    val df = rows.toDF("id", "key").repartition(13)
    val out = Relational.allocateIds(df, "id", Seq(col("key")))
      .as[(Long, String)].collect().toMap.map(_.swap)
    val maxId = rows.flatMap(_._1).max
    val expected = rows.filter(_._1.isEmpty).map(_._2).sorted.zipWithIndex
      .map { case (k, idx) => k -> (maxId + idx + 1) }.toMap
    rows.foreach {
      case (Some(id), k) => assert(out(k) == id, s"matched row moved: $k")
      case (None, k) => assert(out(k) == expected(k), s"allocation moved: $k")
    }
    // ids are dense and unique above the previous max
    val allocated = rows.filter(_._1.isEmpty).map(m => out(m._2))
    assert(allocated.toSet == (maxId + 1 to maxId + allocated.size).toSet)
  }

  test("dedupByKeys keeps deterministic survivor") {
    val df = Seq((1, 2, "b"), (1, 1, "a"), (2, 5, "z")).toDF("k", "ord", "v")
    val out = Relational.dedupByKeys(df, Seq("k"), Seq(col("ord").asc))
      .orderBy("k").as[(Int, Int, String)].collect().toSeq
    assert(out == Seq((1, 1, "a"), (2, 5, "z")))
  }

  test("fixedWidth pads with nulls past array end") {
    val df = Seq((1, Seq("a", "b"))).toDF("id", "arr")
    val out = Relational.fixedWidth(df, "arr", "v", 3)
    val r = out.collect().head
    assert(r.getString(1) == "a" && r.getString(2) == "b" && r.isNullAt(3))
  }

  test("fuzzyTwoStageJoin falls back to weak key") {
    val probe = Seq((1, Some("alice"), "ali"), (2, None, "bob"))
      .toDF("pid", "strong", "weak")
    val dim = Seq(("alice", "ali", 100), ("bobby", "bob", 200))
      .toDF("s_key", "w_key", "payload")
    val out = Relational.fuzzyTwoStageJoin(
      probe, dim,
      strongKey = (col("strong"), col("s_key")),
      weakKey = (col("weak"), col("w_key")),
      pick = Seq("payload"))
    val got = out.select("pid", "payload").orderBy("pid")
      .as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 100), (2, 200)))
  }

  test("fuzzyTwoStageJoin: strong match with null picked value is NOT retried") {
    val probe = Seq((1, "alice", "zz")).toDF("pid", "strong", "weak")
    val dim = Seq((Option.empty[String], 7, "alice", "zz"), (Some("wrong"), 8, "nobody", "zz"))
      .toDF("payload", "extra", "s_key", "w_key")
    val out = Relational.fuzzyTwoStageJoin(
      probe, dim,
      strongKey = (col("strong"), col("s_key")),
      weakKey = (col("weak"), col("w_key")),
      pick = Seq("payload", "extra"))
    // the strong match (payload=null, extra=7) must win; a null-based hit
    // test would fall through to the weak key and attach ("wrong", 8)
    val got = out.select("payload", "extra").as[(Option[String], Int)].collect().toSeq
    assert(got == Seq((None, 7)))
  }

  test("upsert merge: default tiebreak is deterministic with duplicate batch keys") {
    val base = Seq((1, "x", 0)).toDF("k", "v", "seq")
    val upd = Seq((1, "a", 5), (1, "b", 3)).toDF("k", "v", "seq")
    val expected = Upsert.merge(base, upd, Seq("k"))
      .as[(Int, String, Int)].collect().toSeq
    // survivor is a pure function of the row multiset: repeat runs agree,
    // and replaying the batch is a no-op
    (1 to 3).foreach { _ =>
      val again = Upsert.merge(base, upd, Seq("k"))
        .as[(Int, String, Int)].collect().toSeq
      assert(again == expected)
    }
    val replay = Upsert.merge(
      Upsert.merge(base, upd, Seq("k")), upd, Seq("k"))
      .as[(Int, String, Int)].collect().toSeq
    assert(replay == expected)
  }

  test("upsert merge: updates win, inserts appear, idempotent") {
    val base = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val upd = Seq((1, "new"), (3, "ins")).toDF("k", "v")
    val m1 = Upsert.merge(base, upd, Seq("k"))
    val got = m1.orderBy("k").as[(Int, String)].collect().toSeq
    assert(got == Seq((1, "new"), (2, "keep"), (3, "ins")))
    val m2 = Upsert.merge(m1, upd, Seq("k"))
    assert(m2.orderBy("k").as[(Int, String)].collect().toSeq == got)
  }

  test("upsert merge: latest-wins inside batch under tiebreak") {
    val base = Seq((1, 0, "old")).toDF("k", "seq", "v")
    val upd = Seq((1, 1, "first"), (1, 2, "second")).toDF("k", "seq", "v")
    val m = Upsert.merge(base, upd, Seq("k"), Seq(col("seq")))
    assert(m.select("v").as[String].collect().toSeq == Seq("second"))
  }
}
