package graft

import graft.domain.{ContestantStats, Pipelines, Runner, Schemas}
import graft.ops.Upsert
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardOpenOption}
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

  /** The reference E3 lifecycle end-to-end: paginated REST extract →
    * watermark resume → transform → idempotent upsert, into BOTH stores
    * the library ships — the Runner parquet warehouse (watermark source)
    * and a live JDBC database through JdbcUpsertSink (embedded Derby,
    * AnsiMerge dialect). Run 2 resumes from the warehouse watermark with
    * an overlap window (at-least-once delivery), so re-served duplicates
    * flow through the whole chain and must change nothing; run 3 replays
    * run 2 verbatim and must be a byte-level no-op in both stores. */
  test("incremental rest → watermark → transform → upsert lifecycle (run 2 resumes, run 3 no-op)") {
    import spark.implicits._
    val feed = Files.createTempDirectory("graft_e3_feed")
    val store = Files.createTempDirectory("graft_e3_store").toString
    val r = new Runner(spark, store)
    val url = "jdbc:derby:memory:grafte3;create=true"
    // string key ⇒ staging types must be comparable with the target's
    // VARCHAR key (Derby stages StringType as CLOB by default)
    val sink = new Upsert.JdbcUpsertSink(url, stagingColumnTypes = Some(
      "id VARCHAR(16), author VARCHAR(32), body VARCHAR(256)"))
    locally {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try st.execute(
          """CREATE TABLE reddit_mirror ("id" VARCHAR(16) PRIMARY KEY,
            |"author" VARCHAR(32), "body" VARCHAR(256), "score" BIGINT,
            |"created_utc" BIGINT)""".stripMargin.replace("\n", " "))
        finally st.close()
      } finally conn.close()
    }

    def emit(recs: Seq[(String, Long, String, Long)]): Unit = {
      val lines = recs.map { case (id, ts, author, score) =>
        s"""{"id":"$id","created_utc":$ts,"author":"$author","text":"t-$id","score":$score}"""
      }.mkString("", "\n", "\n")
      Files.write(feed.resolve("feed.jsonl"),
        lines.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }

    /** One increment: cursor from the warehouse watermark minus a 2 s
      * overlap window (the at-least-once replay the reference's SELECT
      * MAX resume implies — startTs is exclusive, so the overlap re-reads
      * the last two emitted seconds), extract via graft-rest, transform
      * the raw page payload into the catalog shape, upsert into both
      * stores. */
    def runIncrement(): Unit = {
      val cursor = r.watermark("reddit_comments", "created_dt")
        .map(ts => ts.getTime / 1000L - 2L).getOrElse(0L)
      val raw = spark.read.format("graft-rest")
        .option("path", feed.toString).option("startTs", cursor.toString)
        .load()
      val parsed = raw.select(col("created_utc"),
          from_json(col("body"), org.apache.spark.sql.types.StructType
            .fromDDL("id STRING, author STRING, text STRING, score BIGINT"))
            .as("j"))
        .select(col("j.id").as("id"), col("j.author").as("author"),
          col("j.text").as("body"), col("j.score").as("score"),
          col("created_utc"),
          to_timestamp(col("created_utc")).as("created_dt"))
      r.upsert("reddit_comments", parsed)
      Upsert.viaTempTable(
        parsed.select("id", "author", "body", "score", "created_utc"),
        sink, "reddit_mirror", Seq("id"), dialect = Upsert.AnsiMerge)
    }

    def mirror(): Set[(String, String, Long, Long)] =
      spark.read.jdbc(url, "reddit_mirror", new java.util.Properties)
        .selectExpr("id", "author", "score", "created_utc")
        .as[(String, String, Long, Long)].collect().toSet
    def warehouse(): Set[(String, String, Long, Long)] =
      r.state("reddit_comments")
        .selectExpr("id", "author", "score", "created_utc")
        .as[(String, String, Long, Long)].collect().toSet

    // run 1: cold start — watermark empty, full backfill
    emit(Seq(("c1", 100L, "ann", 5L), ("c2", 101L, "bo", 3L),
      ("c3", 102L, "cy", 7L), ("c4", 103L, "dee", 1L)))
    assert(r.watermark("reddit_comments", "created_dt").isEmpty)
    runIncrement()
    val after1 = Set(("c1", "ann", 5L, 100L), ("c2", "bo", 3L, 101L),
      ("c3", "cy", 7L, 102L), ("c4", "dee", 1L, 103L))
    assert(warehouse() == after1 && mirror() == after1)
    assert(r.watermark("reddit_comments", "created_dt")
      .contains(new Timestamp(103000L)))

    // run 2: the feed gained two records AND re-serves the watermark
    // boundary (c3, c4 appear twice in the file — the duplicate/late
    // delivery the overlap window deliberately re-reads)
    emit(Seq(("c3", 102L, "cy", 7L), ("c4", 103L, "dee", 1L),
      ("c5", 104L, "ed", 9L), ("c6", 105L, "flo", 2L)))
    runIncrement()
    val after2 = after1 + (("c5", "ed", 9L, 104L)) + (("c6", "flo", 2L, 105L))
    assert(warehouse() == after2 && mirror() == after2)

    // run 3: nothing new upstream — the increment re-reads the overlap
    // window and must change neither store (idempotence of the chain)
    runIncrement()
    assert(warehouse() == after2 && mirror() == after2)
    assert(r.state("reddit_comments").count() == 6)
  }
}
