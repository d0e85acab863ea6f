package graft

import graft.domain.Runner
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class RunnerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("runner: watermark advances, replay is idempotent, conform applied") {
    val dir = Files.createTempDirectory("graft_runner").toString
    val r = new Runner(spark, dir)

    assert(r.watermark("season", "showing_started").isEmpty)

    val batch1 = Seq(
      (1L, "Borneo", ts("2000-05-31 00:00:00")),
      (2L, "Outback", ts("2001-01-28 00:00:00")))
      .toDF("season_id", "name", "showing_started")
      .withColumn("junk", lit("dropped-by-conform"))
    assert(r.upsert("season", batch1) == 2)
    assert(r.state("season").columns.contains("type")) // conformed to catalog
    assert(!r.state("season").columns.contains("junk"))
    assert(r.watermark("season", "showing_started").contains(ts("2001-01-28 00:00:00")))

    // replay the same batch: still 2 rows
    assert(r.upsert("season", batch1) == 2)

    // increment: extract sees the watermark, merges only newer seasons
    val n = r.increment("season", "showing_started") { wm =>
      assert(wm.contains(ts("2001-01-28 00:00:00")))
      Seq((2L, "Australian Outback", ts("2001-01-28 00:00:00")),
        (3L, "Africa", ts("2001-10-11 00:00:00")))
        .toDF("season_id", "name", "showing_started")
    }
    assert(n == 3)
    val names = r.state("season").select("season_id", "name")
      .as[(Long, String)].collect().toMap
    assert(names == Map(1L -> "Borneo", 2L -> "Australian Outback", 3L -> "Africa"))
  }
}
