package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("attributionJoin equals the naive range join, incl. bucket edges") {
    // clicks straddling bucket boundaries relative to each purchase
    val purchases = Seq((1L, "u", ts(7200)), (2L, "u", ts(7260)), (3L, "v", ts(100)))
      .toDF("pid", "k", "ts")
    val clicks = Seq(
      ("u", ts(3599), 10L), // > 1h before p1 -> no match
      ("u", ts(3600), 11L), // exactly 1h before p1 (inclusive) -> match p1
      ("u", ts(7100), 12L), // matches p1 and p2
      ("u", ts(7250), 13L), // after p1, within p2
      ("v", ts(200), 14L)) // after p3 -> no match
      .toDF("k", "cts", "cid")
    val got = RangeJoin.attributionJoin(purchases, clicks, "k", "ts", "cts",
        lookbackSec = 3600L, payload = Seq("cid"))
      .select("pid", "cid").as[(Long, Long)].collect().toSet
    val naive = purchases.as("p").join(clicks.as("c"),
        col("p.k") === col("c.k") &&
          col("c.cts") >= col("p.ts") - expr("INTERVAL 3600 SECOND") &&
          col("c.cts") <= col("p.ts"))
      .select(col("p.pid"), col("c.cid")).as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 11L), (1L, 12L), (2L, 12L), (2L, 13L)))
  }
}
