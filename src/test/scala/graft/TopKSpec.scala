package graft

import graft.ops.{Scored, ScoredTopK, TopK, TopKByScore}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Laws for the bounded-state top-k Aggregator (ops.TopK): the buffer is a
  * mergeable summary, so merge order must never change the result, and the
  * aggregate must equal the window (sort-everything) form it replaces. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // small score space → heavy ties, exercising the id tiebreak
  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(40, for {
      score <- Gen.choose(0L, 5L)
      id <- Gen.choose(100, 140).map(_.toString)
    } yield (score, id))

  private def reference(rows: Seq[(Long, String)], k: Int): Seq[Scored] =
    rows.distinct.map { case (s, i) => Scored(s, i) }
      .sortBy(x => (-x.score, x.id)).take(k)
      .toList

  test("reduce/merge: any split + merge order equals global sort-take-k") {
    val agg = new TopKByScore(4)
    for (seed <- 1L to 8L) {
      val rows = sample(rowsGen, seed).distinct
      val expect = reference(rows, 4)
      // fold in shuffled order
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      val folded = shuffled.foldLeft(agg.zero)((b, r) =>
        agg.reduce(b, Scored(r._1, r._2)))
      assert(folded.items == expect, s"seed=$seed fold")
      // partition into chunks, reduce each, merge pairwise in both orders
      val parts = shuffled.grouped(7).toList.map(ch =>
        ch.foldLeft(agg.zero)((b, r) => agg.reduce(b, Scored(r._1, r._2))))
      val l2r = parts.foldLeft(agg.zero)(agg.merge)
      val r2l = parts.reverse.foldLeft(agg.zero)(agg.merge)
      assert(l2r.items == expect, s"seed=$seed merge l2r")
      assert(r2l.items == expect, s"seed=$seed merge r2l")
    }
  }

  test("buffer never exceeds k and stays sorted by (score desc, id asc)") {
    val agg = new TopKByScore(3)
    var buf: ScoredTopK = agg.zero
    for (seed <- 1L to 3L; r <- sample(rowsGen, seed)) {
      buf = agg.reduce(buf, Scored(r._1, r._2))
      assert(buf.items.length <= 3)
      val resorted = buf.items.sortBy(x => (-x.score, x.id))
      assert(buf.items == resorted)
    }
  }

  test("udaf form equals the window row_number form on a grouped frame") {
    val rows = (1L to 200L).map { i =>
      (s"g${i % 5}", (i * 2654435761L) % 13, s"id${100 + i}")
    }
    val df = rows.toDF("g", "score", "id").repartition(8)
    val top = TopK.topK(6)
    val got = df.groupBy(col("g"))
      .agg(top(col("score"), col("id")).as("tk"))
      .select(col("g"), posexplode(col("tk.items")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 6)
      .select(col("g"), col("rank"), col("id"), col("score"))
    assert(got.orderBy("g", "rank").collect().toSeq ==
      want.orderBy("g", "rank").collect().toSeq)
  }

  test("bottom-k by negated hash is a mergeable uniform sample: stable under repartition") {
    val df = (1L to 500L).map(i => s"d$i").toDF("id")
    val top = TopK.topK(10)
    val neg = -conv(substring(md5(col("id")), 1, 12), 16, 10).cast("long")
    def sampleIds(parts: Int): Seq[String] =
      df.repartition(parts).groupBy()
        .agg(top(neg, col("id")).as("tk"))
        .select(explode(col("tk.items")).as("it"))
        .select(col("it.id")).as[String].collect().toSeq
    assert(sampleIds(1) == sampleIds(13))
  }
}
