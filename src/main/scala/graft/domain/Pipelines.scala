package graft.domain

import graft.ops.{Relational, Upsert}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline lifecycle pieces shared by every reference module
  * (extract → transform → conform → upsert, driven by an asof watermark).
  */
object Pipelines {

  /** The standard load tail: conform the batch to the catalog schema, then
    * idempotently merge into the current table state on its natural keys.
    * (reference: sync_with_remote + upsert; SURVEY §2.2 K1 / §2.3 P7). */
  def conformAndUpsert(current: DataFrame, batch: DataFrame, table: String): DataFrame = {
    val conformed = Relational.conformTo(batch, Schemas.of(table))
    Upsert.merge(current, conformed, Schemas.keys(table))
  }

  /** Seasons still in flight as of the watermark — the incremental-work
    * filter every extract starts from (reference `search_for_new_seasons` +
    * currently-running test, helpers/extract_helpers.py:7-57; SURVEY §2.3
    * P4). Pushes down to the season scan. */
  def activeSeasons(season: DataFrame, asof: Column): DataFrame =
    season.filter(
      col("showing_started").isNotNull &&
        (col("showing_ended").isNull || col("showing_ended") > asof))

  /** The reference's docx confessional parser (S5,
    * confessional/confessional_extract.py:26-47) re-expressed set-based:
    * a regex state machine over numbered lines becomes
    *   - `Day (\d+)` markers → last(day, ignoreNulls) carried forward (W4)
    *   - `Name (i/total): text` rows → regex-extract bank (§2.8)
    *   - the running `order` counter → row_number over line order
    * Input: (doc_id, line_no, line). One shuffle on doc_id; both windows
    * share its sort. */
  def parseConfessionalLines(lines: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("line_no"))
    val carry = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dayPat = "^Day (\\d+)$"
    val rowPat = "^(\\w+ ?\\w*) \\((\\d+)/(\\d+)\\): (.*)$"
    val dayMark = regexp_extract(col("line"), dayPat, 1)
    val parsed = lines
      .withColumn("day_mark", when(dayMark =!= "", dayMark.cast("int")))
      .withColumn("day", last(col("day_mark"), ignoreNulls = true).over(carry))
      .withColumn("speaker", regexp_extract(col("line"), rowPat, 1))
      .filter(col("speaker") =!= "")
      .withColumn("n_from_player", regexp_extract(col("line"), rowPat, 2).cast("int"))
      .withColumn("total_confessionals_in_episode",
        regexp_extract(col("line"), rowPat, 3).cast("int"))
      .withColumn("content", regexp_extract(col("line"), rowPat, 4))
    parsed
      .withColumn("n_in_episode",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("line_no"))))
      .select(col("doc_id"), col("day"), col("speaker"), col("n_from_player"),
        col("total_confessionals_in_episode"), col("n_in_episode"), col("content"))
  }

  /** Reference file-name convention `(\d+)x(\d+)_ (.*)` →
    * (season_number, episode_number, title)
    * (confessional/confessional_extract.py:52-57). */
  def parseEpisodeFileName(name: Column): Column = {
    val pat = "^(\\d+)x(\\d+)_ (.*)$"
    struct(
      regexp_extract(name, pat, 1).cast("int").as("season_number"),
      regexp_extract(name, pat, 2).cast("int").as("episode_number"),
      regexp_extract(name, pat, 3).as("title"))
  }

  /** Wiki date-range parse (season/season_transform.py:31-37): strings
    * like "February 12[1] – May 13, 2020" → (start, end) timestamps.
    * The reference's pattern keeps groups 1 and 4 (footnote markers
    * dropped) and feeds them to pandas' permissive parser; here the
    * extracted pieces go through try_to_timestamp over the formats the
    * wiki actually uses (a year-less start date inherits the end's year,
    * as pandas did implicitly). */
  def parseDateRange(text: Column): Column = {
    val pat = "(\\w* \\w*,? ?\\w*)(\\[\\d\\])? (-|–) (\\w* \\w*,? ?\\w*)(\\[\\d\\])?"
    val startRaw = trim(regexp_extract(text, pat, 1))
    val endRaw = trim(regexp_extract(text, pat, 4))
    def parse(c: Column): Column = coalesce(
      try_to_timestamp(c, lit("MMMM d, yyyy")),
      try_to_timestamp(c, lit("MMM d, yyyy")),
      try_to_timestamp(c, lit("yyyy-MM-dd")))
    val endTs = parse(endRaw)
    val startTs = coalesce(
      parse(startRaw),
      // year-less start ("February 12") borrows the end date's year
      try_to_timestamp(concat(startRaw, lit(", "), year(endTs).cast("string")),
        lit("MMMM d, yyyy")),
      try_to_timestamp(concat(startRaw, lit(", "), year(endTs).cast("string")),
        lit("MMM d, yyyy")))
    struct(startTs.as("start"), endTs.as("end"))
  }

  /** Viewership text → millions ×1e8 semantics
    * (helpers/transform_helpers.py:63-70). */
  def viewership(text: Column): Column = {
    val m = regexp_extract(text, "(\\d+\\.\\d+)", 1)
    when(m =!= "", m.cast("double") * 1e8)
  }
}
