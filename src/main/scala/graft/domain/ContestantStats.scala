package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's analytical heart — `pull_agg_contestant_stats`
  * (helpers/db_funcs.py:4-45) — as a Spark DataFrame program.
  *
  * Semantics preserved exactly:
  *  - ranked CTE: per-season placement by (njury DESC, ndays DESC), where
  *    njury = COALESCE(SUM(number_of_jury_votes), -1) per contestant_season
  *  - votes subquery: COUNT(*) votes_against + self-vote → medevac_quit flag
  *  - immunity subquery: SUM(win_pct) over team-phase (team = 1) rows
  *  - 5-way LEFT join from episode_performance_stats, then
  *    GROUP BY (contestant_season_id, first_name, last_name, season_id)
  *    with SUM(days)/MAX(flag) aggregates
  *
  * (The reference joins `eps.contestant_id` to `cs.contestant_season_id` —
  * in its model the fact table's contestant_id IS the contestant_season id;
  * kept as-is for parity.)
  *
  * Scale shape: the three pre-aggregations are partial-aggregated map-side
  * before their shuffles; the join keys all hash-partition on the same id,
  * so AQE coalesces into one exchange reuse; the ranking window shuffles
  * once on season_id. Deterministic rank tiebreak added on the id (the
  * reference's ROW_NUMBER is nondeterministic under ties — declared engine
  * policy, SURVEY §7.4).
  */
object ContestantStats {

  def pullAggContestantStats(
      episodePerformanceStats: DataFrame,
      contestantSeason: DataFrame,
      contestant: DataFrame,
      vote: DataFrame,
      immunityChallenge: DataFrame): DataFrame = {

    val eps = episodePerformanceStats

    val perContestant = eps.groupBy(col("contestant_id"))
      .agg(
        sum(col("number_of_days_spent_in_episode")).as("ndays"),
        coalesce(sum(col("number_of_jury_votes")), lit(-1.0)).as("njury"))

    val ranked = contestantSeason.as("cs")
      .join(perContestant.as("eps"),
        col("cs.contestant_season_id") === col("eps.contestant_id"), "left")
      .select(col("cs.contestant_season_id"), col("cs.season_id"),
        col("njury"), col("ndays"))
      .withColumn("placement",
        row_number().over(Window.partitionBy(col("season_id"))
          .orderBy(col("njury").desc_nulls_last, col("ndays").desc_nulls_last,
            col("contestant_season_id"))).cast("long"))
      .select(col("contestant_season_id"), col("placement"))

    val votesAgg = vote.groupBy(col("voted_for_id"))
      .agg(
        count(lit(1)).as("votes_against"),
        (sum(when(col("voted_for_id") === col("contestant_id"), 1).otherwise(0)) > 0)
          .cast("int").as("medevac_quit"))

    val icAgg = immunityChallenge.filter(col("team") === 1)
      .groupBy(col("contestant_id"))
      .agg(sum(col("win_pct")).as("individual_wins"))

    eps.as("eps")
      .join(contestantSeason.as("cs"),
        col("cs.contestant_season_id") === col("eps.contestant_id"), "left")
      .join(contestant.as("c"),
        col("cs.contestant_id") === col("c.contestant_id"), "left")
      .join(votesAgg.as("v"), col("eps.contestant_id") === col("v.voted_for_id"), "left")
      .join(icAgg.as("ic"), col("ic.contestant_id") === col("eps.contestant_id"), "left")
      .join(ranked.as("r"),
        col("r.contestant_season_id") === col("eps.contestant_id"), "left")
      .groupBy(col("cs.contestant_season_id"), col("c.first_name"),
        col("c.last_name"), col("cs.season_id"))
      .agg(
        sum(col("eps.number_of_days_spent_in_episode")).as("days_lasted"),
        max(col("v.medevac_quit")).as("quit"),
        max(col("v.medevac_quit")).as("med_evac"),
        max(col("v.votes_against")).as("votes_against"),
        max(col("ic.individual_wins")).as("individual_wins"),
        max(col("r.placement")).as("placement"))
  }
}
