package graft

import graft.domain.{ContestantStats, Pipelines, Runner, Schemas}
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** The "reference user switches to graft" walkthrough: every pipeline
  * stage the reference runs (extract batches → parse → conform → upsert →
  * analytics), against the 16-table catalog, with a full replay at the end
  * proving idempotence of the whole store. */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  test("full domain pipeline: load, parse, analyze, replay") {
    val dir = Files.createTempDirectory("graft_e2e").toString
    val r = new Runner(spark, dir)

    // ── season + contestant dims (season module / contestant module)
    r.upsert("season", Seq(
      (1L, "Borneo", Timestamp.valueOf("2000-05-31 00:00:00")))
      .toDF("season_id", "name", "showing_started"))
    r.upsert("contestant", Seq(
      (1L, "Alice", "A"), (2L, "Bob", "B"))
      .toDF("contestant_id", "first_name", "last_name"))
    r.upsert("contestant_season", Seq(
      (10L, 1L, 1L, 1L), (11L, 2L, 1L, 1L))
      .toDF("contestant_season_id", "contestant_id", "season_id", "attempt_number"))

    // ── episode stats facts (episode_stats module; eps.contestant_id is
    // the contestant_season id, as in the reference)
    r.upsert("episode_performance_stats", Seq(
      (10L, 1L, 100L, 10.0, 3.0), (10L, 1L, 101L, 9.0, 4.0),
      (11L, 1L, 100L, 5.0, 0.0))
      .toDF("contestant_id", "season_id", "episode_id",
        "number_of_days_spent_in_episode", "number_of_jury_votes"))
    r.upsert("vote", Seq(
      (1L, 100L, 10L, 11L, 1.0, 1.0), (1L, 100L, 11L, 11L, 1.0, 2.0))
      .toDF("season_id", "episode_id", "contestant_id", "voted_for_id",
        "tc_number", "vote_number"))
    r.upsert("immunity_challenge", Seq(
      (1L, 100L, 10L, 1.0, 0.5, 1.0))
      .toDF("season_id", "episode_id", "contestant_id", "team", "win_pct",
        "tc_number"))

    // ── confessional module: docx lines through the set-based parser
    val lines = Seq(
      (1L, 1L, "Day 2"),
      (1L, 2L, "Alice (1/2): I found the idol."),
      (1L, 3L, "Bob (2/2): Alice is lying."))
      .toDF("doc_id", "line_no", "line")
    val parsed = Pipelines.parseConfessionalLines(lines)
      .join(Seq(("Alice", 1L), ("Bob", 2L)).toDF("speaker", "contestant_id"),
        "speaker")
      .withColumn("season_id", lit(1L))
      .withColumn("episode_id", lit(100L))
    r.upsert("confessional", parsed)
    assert(r.state("confessional").count() == 2)
    assert(r.state("confessional").schema == Schemas.of("confessional"))

    // ── analytics: the flagship aggregate over the STORE state
    def stats() = ContestantStats.pullAggContestantStats(
        r.state("episode_performance_stats"), r.state("contestant_season"),
        r.state("contestant"), r.state("vote"), r.state("immunity_challenge"))
      .select("contestant_season_id", "first_name", "days_lasted",
        "votes_against", "placement")
      .orderBy("contestant_season_id")
      .as[(Long, String, Double, Option[Long], Long)].collect().toSeq

    val expected = Seq(
      (10L, "Alice", 19.0, None, 1L),
      (11L, "Bob", 5.0, Some(2L), 2L))
    assert(stats() == expected)

    // ── replay EVERY batch (crash-recovery semantics): store unchanged
    r.upsert("episode_performance_stats", r.state("episode_performance_stats"))
    r.upsert("vote", r.state("vote"))
    r.upsert("confessional", parsed)
    assert(stats() == expected)
    assert(r.state("confessional").count() == 2)
  }
}
