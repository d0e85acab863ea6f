package graft

import graft.ops.AsofJoin
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("asofJoin picks most recent build row at or before probe ts, per key") {
    val probe = Seq((1L, "u1", ts(100)), (2L, "u1", ts(205)), (3L, "u2", ts(50)))
      .toDF("pid", "k", "ts")
    val build = Seq(("u1", ts(90), 9.0), ("u1", ts(200), 20.0), ("u2", ts(60), 6.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(probe, build, Seq("k"), "ts", "ts", Seq("v"))
      .select("pid", "v").orderBy("pid")
      .as[(Long, Option[Double])].collect().toSeq
    // pid1: build@90 <= 100 -> 9.0; pid2: build@200 <= 205 -> 20.0
    // pid3: u2 build@60 > 50 -> null
    assert(out == Seq((1L, Some(9.0)), (2L, Some(20.0)), (3L, None)))
  }

  test("asofJoin equal-timestamp build row matches (inclusive)") {
    val probe = Seq((1L, "u", ts(100))).toDF("pid", "k", "ts")
    val build = Seq(("u", ts(100), 1.0)).toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(probe, build, Seq("k"), "ts", "ts", Seq("v"))
      .select("v").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0)))
  }

  test("asofJoin numeric tiebreak orders numerically, not lexicographically") {
    val probe = Seq((1L, "u", ts(100))).toDF("pid", "k", "ts")
    // seq 9 vs 10 at the same ts: latest under numeric order is 10
    // (a string-ordered tiebreak would pick 9, since "10" < "9")
    val build = Seq(("u", ts(100), 9L, 90.0), ("u", ts(100), 10L, 100.0))
      .toDF("k", "ts", "seq", "v")
    val out = AsofJoin.asofJoin(probe, build, Seq("k"), "ts", "ts", Seq("v"),
        buildTiebreak = Seq(org.apache.spark.sql.functions.col("seq")))
      .select("v").as[Double].collect().toSeq
    assert(out == Seq(100.0))
  }

  test("asofJoin invariant on events data: matched ts <= probe ts") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val p = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val b = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", org.apache.spark.sql.functions.unix_millis($"ts").as("bts"))
    val out = AsofJoin.asofJoin(p, b, Seq("user_id"), "ts", "ts", Seq("bts"))
    val viol = out.filter($"bts".isNotNull &&
      $"bts" > org.apache.spark.sql.functions.unix_millis($"ts")).count()
    assert(viol == 0)
  }
}
