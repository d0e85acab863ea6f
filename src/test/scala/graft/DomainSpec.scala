package graft

import graft.domain.{ContestantStats, Pipelines, Schemas}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class DomainSpec extends SparkSpec {
  import spark.implicits._

  test("schema registry covers all 16 tables with keys subset of columns") {
    assert(Schemas.all.size == 16)
    assert(Schemas.keys.keySet == Schemas.all.keySet)
    Schemas.keys.foreach { case (t, ks) =>
      val cols = Schemas.of(t).fieldNames.toSet
      assert(ks.forall(cols.contains), s"$t keys $ks not all in schema")
    }
  }

  test("pullAggContestantStats reproduces the reference aggregate semantics") {
    // contestant_season ids double as the fact tables' contestant_id (as in
    // the reference). Two contestants in season 1: cs 10 (jury votes, more
    // days) and cs 11 (fewer days, one self-vote => medevac_quit).
    val eps = Seq(
      (10L, 1L, 100L, 10.0, 3.0), (10L, 1L, 101L, 9.0, 4.0),
      (11L, 1L, 100L, 5.0, 0.0))
      .toDF("contestant_id", "season_id", "episode_id",
        "number_of_days_spent_in_episode", "number_of_jury_votes")
    val cs = Seq((10L, 1L, 1L), (11L, 2L, 1L))
      .toDF("contestant_season_id", "contestant_id", "season_id")
    val c = Seq((1L, "Alice", "A"), (2L, "Bob", "B"))
      .toDF("contestant_id", "first_name", "last_name")
    val vote = Seq(
      (10L, 11L), (10L, 11L), (11L, 11L)) // 11 voted for himself once
      .toDF("contestant_id", "voted_for_id")
    val ic = Seq(
      (10L, 1.0, 0.5), (10L, 1.0, 0.25), (10L, 0.0, 1.0)) // team=0 excluded
      .toDF("contestant_id", "team", "win_pct")

    val out = ContestantStats.pullAggContestantStats(eps, cs, c, vote, ic)
      .orderBy("contestant_season_id")
      .select("contestant_season_id", "first_name", "days_lasted", "quit",
        "votes_against", "individual_wins", "placement")
      .as[(Long, String, Double, Option[Int], Option[Long], Option[Double], Long)]
      .collect().toSeq

    // cs10: days 19, no votes against -> quit null, wins 0.75, jury 7 > cs11's 0 -> placement 1
    // cs11: days 5, 3 votes against, self-vote -> quit 1, no team-1 IC rows -> wins null, placement 2
    assert(out == Seq(
      (10L, "Alice", 19.0, None, None, Some(0.75), 1L),
      (11L, "Bob", 5.0, Some(1), Some(3L), None, 2L)))
  }

  test("activeSeasons keeps running/unfinished seasons only") {
    def ts(s: String) = Timestamp.valueOf(s)
    val seasons = Seq(
      (1L, Some(ts("2020-01-01 00:00:00")), Some(ts("2020-06-01 00:00:00"))),
      (2L, Some(ts("2023-01-01 00:00:00")), None),
      (3L, None, None))
      .toDF("season_id", "showing_started", "showing_ended")
    val got = Pipelines.activeSeasons(seasons, lit(ts("2021-01-01 00:00:00")))
      .select("season_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("parseConfessionalLines: day carry-forward + running order + regex bank") {
    val lines = Seq(
      (1L, 1L, "Day 3"),
      (1L, 2L, "Alice (1/4): I trust Bob."),
      (1L, 3L, "noise line"),
      (1L, 4L, "Day 5"),
      (1L, 5L, "Bob Smith (2/4): Alliance formed."))
      .toDF("doc_id", "line_no", "line")
    val out = Pipelines.parseConfessionalLines(lines)
      .orderBy("n_in_episode")
      .select("day", "speaker", "n_from_player", "n_in_episode", "content")
      .as[(Int, String, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (3, "Alice", 1, 1, "I trust Bob."),
      (5, "Bob Smith", 2, 2, "Alliance formed.")))
  }

  test("conformAndUpsert: conform to catalog then keyed merge") {
    val current = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.of("season"))
    val batch = Seq((1L, "Borneo", "extra-dropped"))
      .toDF("season_id", "name", "not_in_catalog")
    val out = Pipelines.conformAndUpsert(current, batch, "season")
    assert(out.schema == Schemas.of("season"))
    val r = out.select("season_id", "name").as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "Borneo")))
    // replay the same batch: still one row (idempotent)
    assert(Pipelines.conformAndUpsert(out, batch, "season").count() == 1)
  }

  test("parseDateRange: wiki ranges incl. footnotes and year-less starts") {
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      "February 12[1] – May 13, 2020",
      "March 1 - June 2, 2019",
      "not a range").toDF("t")
      .select(Pipelines.parseDateRange($"t").as("r"))
      .select("r.start", "r.end")
      .as[(Option[Timestamp], Option[Timestamp])].collect().toSeq
    assert(rows(0) == ((Some(ts("2020-02-12 00:00:00")), Some(ts("2020-05-13 00:00:00")))))
    assert(rows(1) == ((Some(ts("2019-03-01 00:00:00")), Some(ts("2019-06-02 00:00:00")))))
    assert(rows(2) == ((None, None)))
  }

  test("scalar helpers: filename parse + viewership") {
    val r = Seq("12x07_ The Merge").toDF("f")
      .select(Pipelines.parseEpisodeFileName($"f").as("p"))
      .select("p.season_number", "p.episode_number", "p.title")
      .as[(Int, Int, String)].collect().head
    assert(r == ((12, 7, "The Merge")))
    val v = Seq("8.93 million viewers").toDF("t")
      .select(Pipelines.viewership($"t")).as[Option[Double]].collect().head
    assert(v.contains(8.93e8))
  }
}
