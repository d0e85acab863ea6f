package graft.domain

import org.apache.spark.sql.types._

/** The reference's 16-table catalog (Postgres schema `survivor`) as Spark
  * StructTypes + natural-key metadata.
  *
  * "The remote schema is the authority" (reference `sync_with_remote`,
  * helpers/transform_helpers.py:5-39) maps to: every pipeline output is
  * `Relational.conformTo(df, Schemas.of(table))` before
  * `Upsert.merge(current, batch, Schemas.keys(table))`.
  *
  * Columns from the reference transforms/queries (FIXTURES.md §A; see the
  * file:line citations there). Keys from the load modules' ON CONFLICT
  * lists (contestant/contestant_load.py:7-10,
  * episode_stats/episode_stats_load.py:12-17, episodes/episodes_load.py:7-10,
  * confessional/confessional_load.py:6, reddit/reddit_load.py:8-12,
  * season/season_load.py:5).
  */
object Schemas {

  private def f(n: String, t: DataType) = StructField(n, t)
  private def strings(ns: String*) = ns.map(f(_, StringType))
  private def longs(ns: String*) = ns.map(f(_, LongType))
  private def doubles(ns: String*) = ns.map(f(_, DoubleType))

  val season: StructType = StructType(
    longs("season_id", "season_number", "winner_id", "runnerup_0_id", "runnerup_1_id") ++
    strings("name", "type", "location", "version", "summary", "history", "trivia", "twists") ++
    Seq(f("filming_started", TimestampType), f("filming_ended", TimestampType),
      f("showing_started", TimestampType), f("showing_ended", TimestampType)) ++
    doubles("n_episodes", "days", "n_survivors", "viewership_in_millions"))

  val episode: StructType = StructType(
    longs("episode_id", "season_id") ++
    strings("episode_name", "summary", "story", "challenges", "trivia", "wiki_link", "image") ++
    Seq(f("firstbroadcast", TimestampType)) ++
    doubles("season_episode_number", "overall_episode_number", "viewership",
      "survivor_rating", "overall_slot_rating"))

  val contestant: StructType = StructType(
    longs("contestant_id") ++
    strings("first_name", "last_name", "sex", "birthdate", "hometown",
      "current_residence", "occupation", "hobbies", "pet_peeves", "three_words",
      "claim_to_fame", "inspiration", "three_things", "most_similar_self_reported",
      "reason", "why_survive", "previous_season", "wiki_survivor_text",
      "wiki_postsurvivor_text", "trivia", "other_profile", "image", "wikia"))

  val contestantSeason: StructType = StructType(
    longs("contestant_season_id", "contestant_id", "season_id", "attempt_number",
      "tribe_0", "tribe_1", "tribe_2", "tribe_3",
      "alliance_0", "alliance_1", "alliance_2") ++
    doubles("days_lasted", "quit", "med_evac", "votes_against", "individual_wins",
      "placement"))

  val tribe: StructType = StructType(
    longs("tribe_id", "season_id", "lowest_placing_member", "highest_placing_member",
      "opponent_0", "opponent_1", "opponent_2") ++
    strings("name", "tribenameorigin", "tribetype", "dayformed", "status",
      "summary", "tribal_history", "trivia", "insigniaimage", "flagimage",
      "buffimage", "image"))

  val alliance: StructType = StructType(
    longs("alliance_id", "season_id", "founder_0", "founder_1", "founder_2",
      "highest_placing_0", "highest_placing_1", "lowest_placing_member") ++
    strings("name", "dayformed", "summary", "history", "trivia"))

  val vote: StructType = StructType(
    longs("season_id", "episode_id", "contestant_id", "voted_for_id") ++
    doubles("tc_number", "vote_number", "total_players_remaining"))

  val immunityChallenge: StructType = StructType(
    longs("season_id", "episode_id", "contestant_id") ++
    strings("win", "sitout") ++
    doubles("team", "win_pct", "episode_win_pct", "tc_number",
      "total_players_remaining"))

  val rewardChallenge: StructType = StructType(
    longs("season_id", "episode_id", "contestant_id") ++
    strings("win", "sitout") ++
    doubles("team", "win_pct", "episode_win_pct", "tc_number",
      "total_players_remaining", "challenge_number"))

  /** 22 renamed box-score stats, summed per key
    * (episode_stats/episode_stats_transform.py:90-137). */
  val statColumns: Seq[String] = Seq(
    "challenge_wins", "challenge_appearances", "sitout", "voted_for_bootee",
    "votes_against_player", "total_number_of_votes_in_episode",
    "tribal_council_appearances", "number_of_jury_votes",
    "total_number_of_jury_votes", "votes_at_council",
    "number_of_days_spent_in_episode", "days_in_exile",
    "individual_reward_challenge_appearances", "individual_reward_challenge_wins",
    "individual_immunity_challenge_wins", "individual_immunity_challenge_appearances",
    "tribal_reward_challenge_appearances", "tribal_reward_challenge_wins",
    "tribal_immunity_challenge_appearances", "tribal_immunity_challenge_wins",
    "tribal_reward_challenge_second_of_three_place",
    "tribal_immunity_challenge_second_of_three_place", "fire_immunity_challenge",
    "tribal_immunity_challenge_third_place")

  val episodePerformanceStats: StructType = StructType(
    longs("contestant_id", "season_id", "episode_id") ++ doubles(statColumns: _*))

  val confessional: StructType = StructType(
    longs("contestant_id", "season_id", "episode_id") ++
    Seq(f("day", IntegerType), f("n_from_player", IntegerType),
      f("total_confessionals_in_episode", IntegerType), f("n_in_episode", IntegerType)) ++
    strings("content"))

  val votingConfessional: StructType = StructType(
    longs("voter_id", "recipient_id", "season", "episode_id") ++
    strings("type_of_vote", "initial_or_changed", "for_or_against", "content"))

  val finalWords: StructType = StructType(
    longs("contestant_id", "season", "episode_id") ++ strings("content"))

  val storyQuotes: StructType = StructType(
    longs("contestant_id", "season", "episode_id") ++ strings("content"))

  val redditSubmissions: StructType = StructType(
    strings("id", "author", "title", "subreddit", "stringified_media") ++
    longs("created_utc", "score", "most_recent_season", "most_recent_episode",
      "within_season") ++
    Seq(f("created_dt", TimestampType)))

  val redditComments: StructType = StructType(
    strings("id", "author", "body", "subreddit", "stringified_media") ++
    longs("created_utc", "score", "most_recent_season", "most_recent_episode",
      "within_season") ++
    Seq(f("created_dt", TimestampType)))

  val all: Map[String, StructType] = Map(
    "season" -> season, "episode" -> episode, "contestant" -> contestant,
    "contestant_season" -> contestantSeason, "tribe" -> tribe,
    "alliance" -> alliance, "vote" -> vote,
    "immunity_challenge" -> immunityChallenge,
    "reward_challenge" -> rewardChallenge,
    "episode_performance_stats" -> episodePerformanceStats,
    "confessional" -> confessional,
    "voting_confessional" -> votingConfessional,
    "final_words" -> finalWords, "story_quotes" -> storyQuotes,
    "reddit_submissions" -> redditSubmissions,
    "reddit_comments" -> redditComments)

  /** Natural (upsert-conflict) keys per table. */
  val keys: Map[String, Seq[String]] = Map(
    "season" -> Seq("season_id"),
    "episode" -> Seq("episode_id"),
    "contestant" -> Seq("contestant_id"),
    "contestant_season" -> Seq("contestant_season_id"),
    "tribe" -> Seq("tribe_id"),
    "alliance" -> Seq("alliance_id"),
    "vote" -> Seq("season_id", "episode_id", "tc_number", "contestant_id", "vote_number"),
    "reward_challenge" -> Seq("tc_number", "season_id", "contestant_id", "episode_id", "challenge_number"),
    "immunity_challenge" -> Seq("tc_number", "season_id", "contestant_id", "episode_id"),
    "episode_performance_stats" -> Seq("episode_id", "contestant_id", "season_id"),
    "confessional" -> Seq("day", "n_in_episode", "episode_id", "contestant_id"),
    "voting_confessional" -> Seq("voter_id", "season", "episode_id", "content"),
    "final_words" -> Seq("contestant_id", "season", "episode_id", "content"),
    "story_quotes" -> Seq("season", "episode_id", "content"),
    "reddit_submissions" -> Seq("id"),
    "reddit_comments" -> Seq("id"))

  def of(table: String): StructType = all(table)
}
