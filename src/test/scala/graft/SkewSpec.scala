package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // key 1 is hot (10% of rows)
    val small = Seq((1L, "hot"), (2L, "two"), (777L, "x")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedAgg two-phase equals direct aggregation") {
    val df = (1 to 500).map(i => (if (i % 5 == 0) 1L else i.toLong, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, "k", 8,
      aggs = Seq(sum("v").as("s"), count(lit(1)).as("n")),
      merges = Seq(sum("s").as("s"), sum("n").as("n")))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == direct)
  }
}
