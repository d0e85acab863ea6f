package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Core relational helpers, each mapping to a row of SURVEY.md §2.
  *
  * All helpers are pure LogicalPlan transformations (built-in Catalyst
  * expressions only) so predicate pushdown / column pruning / AQE keep
  * working through them — nothing here blocks whole-stage codegen.
  */
object Relational {

  /** Broadcast hint gated on the optimizer's size estimate: hint only
    * when the estimated build side fits the session's
    * autoBroadcastJoinThreshold, otherwise hand the join back to the
    * planner (shuffle join at scale). Exists because (a) an UNGATED hint
    * bypasses the threshold and grows O(build) into every executor —
    * broadcast OOM at 100 TB (r12 advice on x106), and (b) frames that
    * ride a cache's partitioning reach the join without a materialized
    * exchange, so AQE has no runtime stats to convert a small SMJ side
    * itself. */
  def gatedBroadcast(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (thr > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr))
      broadcast(df)
    else df
  }

  /** Schema conformance (SURVEY §2.3 P7; reference
    * `helpers/transform_helpers.py:5-39` `sync_with_remote`): the target
    * schema is the authority. Missing columns are added as typed nulls,
    * present columns are cast to the target type, extra columns are dropped.
    * Pure projection — stays inside whole-stage codegen, prunes the scan to
    * exactly the target columns.
    */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val dropped = df.columns.filterNot(target.fieldNames.contains)
    if (dropped.nonEmpty)
      // dropping unknown columns is load-bearing (source fields churn) but
      // must stay visible, as the reference logs it
      // (helpers/transform_helpers.py:35-36)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"conformTo dropping columns not in target schema: ${dropped.mkString(", ")}")
    val cols = target.fields.map { case StructField(name, dt, _, _) =>
      if (have(name)) col(name).cast(dt).as(name)
      else lit(null).cast(dt).as(name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Union-all with schema reconciliation (SURVEY §2.7 O3; reference
    * loop-`pd.concat` with `reindex(columns)`,
    * `episode_stats/episode_stats_extract.py:362-369`). Single n-way union,
    * not a quadratic fold of materialized frames: Spark unions are lazy plan
    * nodes, so this is O(n) plan construction and one job.
    */
  def unionByNameAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionByNameAll of empty sequence")
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Deterministic id allocation for rows with a null id (SURVEY §2.5 A3;
    * reference `MAX(id)+1` + `np.arange`,
    * `contestant/contestant_extract.py:296-317,351-358`).
    *
    * The reference allocates in Python arrival order — nondeterministic in a
    * distributed engine. Here the caller supplies a stable ordering key and
    * new ids are `max(existing) + row_number() over (order by key)`.
    *
    * Scale note: the global row_number is computed two-level, the same
    * shape as [[prefixSum]] — range-partition the null-id subset on the
    * ordering key, rank within each partition in parallel, then add each
    * partition's starting offset (a broadcast triangular join over the
    * one-row-per-partition counts frame). No single-partition window
    * anywhere in the plan, so the op survives a BULK unmatched batch, not
    * just the reference's handful-of-new-entities-per-run remainder.
    * Range partitioning keeps equal ordering keys in one partition, so
    * assignments match the serial `row_number() over (order by key)`
    * exactly whenever the key is unique (ties tie-break arbitrarily, as
    * any row_number does).
    */
  def allocateIds(df: DataFrame, idCol: String, orderBy: Seq[Column]): DataFrame = {
    require(orderBy.nonEmpty, "allocateIds needs a stable ordering key")
    val matched = df.filter(col(idCol).isNotNull)
    val unmatched = df.filter(col(idCol).isNull)
    val maxId = coalesce(max(col(idCol)), lit(0L))
    // level 1: parallel per-range ranks over the range-partitioned subset
    val parted = unmatched.repartitionByRange(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid")).orderBy(orderBy: _*)
    val local = parted.withColumn("__lrn", row_number().over(wIn))
    // level 2: per-range starting offsets (≤ #shuffle-partitions rows).
    // Derived from `local` (max local rank ≡ partition count) so both
    // levels consume the one window frame — the second subplan over the
    // range exchange goes away, and with it the dependency on exchange
    // reuse keeping two sampled range partitionings identical (ADVICE r11)
    val counts = local.groupBy(col("__pid")).agg(max(col("__lrn")).as("__cnt"))
    val offsets = counts.as("a")
      .join(broadcast(counts.select(col("__pid").as("__bpid"),
        col("__cnt").as("__bcnt"))), col("__bpid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
    val allocated = local.join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(matched.agg(maxId.as("__max_id"))))
      .withColumn(idCol, col("__max_id") + col("__off") + col("__lrn"))
    matched.unionByName(allocated.select(df.columns.map(col).toSeq: _*))
  }

  /** Per-group 1-based rank by `orderBy` WITHOUT a per-group window
    * bottleneck — [[allocateIds]]'s two-level shape generalized to
    * grouped ranking, for the case where groups are FEW (x165's 8
    * workers) while rows are data-sized: `row_number().over(
    * Window.partitionBy(group))` would cap parallelism at the group
    * count at any corpus size. Level 1 range-partitions on
    * (groups, orderBy) — equal keys stay together and every group spans
    * a contiguous run of partitions — and ranks locally in parallel;
    * level 2 adds each (partition, group)'s starting offset from a
    * broadcast triangular join over the one-row-per-(partition, group)
    * counts frame (≤ #partitions + #groups rows). Matches the serial
    * per-group row_number exactly whenever (orderBy) is unique within a
    * group (ties tie-break arbitrarily, as any row_number does). */
  def rankWithinGroups(df: DataFrame, groupCols: Seq[String],
                       orderBy: Seq[Column], outCol: String): DataFrame = {
    require(groupCols.nonEmpty && orderBy.nonEmpty,
      "rankWithinGroups needs group columns and an ordering key")
    val gcols = groupCols.map(col)
    val parted = df.repartitionByRange((gcols ++ orderBy): _*)
      .withColumn("__pid", spark_partition_id())
    val wIn = Window.partitionBy((col("__pid") +: gcols): _*)
      .orderBy(orderBy: _*)
    val local = parted.withColumn("__lrn", row_number().over(wIn).cast("long"))
    // counts derive from `local` (max local rank ≡ group size in the
    // partition), not from a second aggregation over `parted`: both
    // levels then share the one computed window frame, so correctness no
    // longer rests on exchange reuse resolving two range exchanges to
    // the same sampled bounds (ADVICE r11)
    val counts = local.groupBy((col("__pid") +: gcols): _*)
      .agg(max(col("__lrn")).as("__cnt"))
    val earlier = counts.select((col("__pid").as("__bpid") +:
      groupCols.map(c => col(c).as(s"__b_$c")) :+
      col("__cnt").as("__bcnt")): _*)
    val sameGroupBefore = groupCols.map(c => col(s"__b_$c") <=> col(s"a.$c"))
      .reduce(_ && _) && col("__bpid") < col("a.__pid")
    val offsets = counts.as("a")
      .join(broadcast(earlier), sameGroupBefore, "left")
      .groupBy((col("a.__pid").as("__pid") +:
        groupCols.map(c => col(s"a.$c").as(c))): _*)
      .agg(coalesce(sum(col("__bcnt")), lit(0L)).as("__off"))
    // final join null-safe on the group columns (matching the <=> the
    // triangular offsets join uses): a null-valued group is a real group
    // to row_number-over-window semantics, so its rows must pick up
    // their offset rather than silently drop through an equi-join
    // (ADVICE r11)
    val off = offsets.select((col("__pid").as("__opid") +:
      groupCols.map(c => col(c).as(s"__og_$c")) :+ col("__off")): _*)
    val onPidAndGroups = (col("__pid") === col("__opid")) &&
      groupCols.map(c => col(c) <=> col(s"__og_$c")).reduce(_ && _)
    local.join(broadcast(off), onPidAndGroups)
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__opid", "__lrn", "__off")
      .drop(groupCols.map(c => s"__og_$c"): _*)
  }

  /** First-non-null with literal default (reference `iterative_replace_null`
    * `episode_stats/episode_stats_transform.py:32-45`). */
  def firstNonNull(cols: Seq[Column], default: Column): Column =
    coalesce((cols :+ default): _*)

  /** Fixed-width array expansion (SURVEY §2.7 O6; reference pads arrays to
    * k columns, `contestant/contestant_transform.py:22-76,102-135`).
    * `element_at` past the end yields null = the reference's padding.
    */
  def fixedWidth(df: DataFrame, arrCol: String, prefix: String, n: Int): DataFrame = {
    val expanded = (0 until n).map(i => try_element_at(col(arrCol), lit(i + 1)).as(s"${prefix}_$i"))
    df.select((df.columns.filterNot(_ == arrCol).map(col) ++ expanded).toSeq: _*)
  }

  /** Keyed dedup with a deterministic survivor (SURVEY §2.3 P8 + §7.4
    * order-dependent-dedup risk): instead of `dropDuplicates(keys)` (keeps an
    * arbitrary row — nondeterministic across runs/partitionings), keep the
    * first row per key under an explicit tiebreak ordering. One shuffle on
    * the keys; the window and the downstream grouping share that
    * partitioning.
    */
  def dedupByKeys(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Map-of-lists → rows (SURVEY §2.9 G1; reference `create_dict_based_df`
    * episodes/episodes_transform.py:83-119): each (key → [values]) entry of
    * a map column becomes one row per value. Pure built-in generators. */
  def explodeMapOfLists(df: DataFrame, mapCol: String,
                        keyName: String, valueName: String): DataFrame = {
    val exploded = df.select(
      (df.columns.toIndexedSeq.filterNot(_ == mapCol).map(col) :+
        explode(col(mapCol)).as(Seq("__k", "__vs"))): _*)
    exploded.select(
      (exploded.columns.toIndexedSeq.filterNot(c => c == "__k" || c == "__vs").map(col) :+
        col("__k").as(keyName) :+ explode(col("__vs")).as(valueName)): _*)
  }

  /** Distributed running total over a global ordering — the two-level
    * prefix-sum that replaces an unpartitioned `Window.orderBy` (which
    * funnels the whole dataset through ONE task and is serial by
    * construction).
    *
    * Level 1: rows shuffle on a coarse range key (`orderCol / rangeSize`)
    * and cumulate within each range — fully parallel windows. Level 2:
    * per-range totals (one row per range) get each range's starting offset;
    * offsets broadcast back onto the level-1 rows. The offset step runs as
    * a broadcast triangular join over the TOTALS frame, so no stage in the
    * plan has a single-partition exchange.
    *
    * Output = input columns + `outCol` (the inclusive running sum in
    * `orderCol` order). Scale: choose rangeSize so #ranges stays
    * broadcast-small (e.g. 1e6 rows/range → 1e5 range rows at 1e11 rows);
    * the triangular join is #ranges² pairs spread over the cluster — for
    * truly huge range counts, recurse (prefix-sum the totals frame).
    * `orderCol` must be numeric and unique (a doc id / sequence number). */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String, rangeSize: Long): DataFrame = {
    require(rangeSize > 0)
    val base = df.withColumn("__rng", floor(col(orderCol) / rangeSize).cast("long"))
    val wIn = Window.partitionBy(col("__rng")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__local", sum(col(valueCol)).over(wIn))
    val totals = base.groupBy(col("__rng")).agg(sum(col(valueCol)).as("__tot"))
    val offsets = totals.as("a")
      .join(broadcast(totals.select(col("__rng").as("__brng"), col("__tot").as("__btot"))),
        col("__brng") < col("a.__rng"), "left")
      .groupBy(col("a.__rng").as("__rng"))
      .agg(coalesce(sum(col("__btot")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), Seq("__rng"))
      .withColumn(outCol, col("__local") + col("__off"))
      .drop("__rng", "__local", "__off")
  }

  /** Distributed EXCLUSIVE running maximum over a global ordering — the
    * prefix-max sibling of [[prefixSum]], same two-level shape (per-range
    * windows + a broadcast triangular join over the one-row-per-range
    * totals frame, no single-partition exchange anywhere).
    *
    * Exclusive: each row's `outCol` is the max of `valueCol` over rows
    * with STRICTLY SMALLER `orderCol` — null when no such row exists.
    * That is the form dominance tests want (2-D Pareto frontier: order by
    * one dimension descending via negation, a point survives iff its
    * other dimension beats the exclusive prefix-max). The within-range
    * frame is a RANGE frame (`rangeBetween(unboundedPreceding, -1)`), so
    * ties in `orderCol` are excluded together — deterministic whatever
    * the physical row order; `orderCol` must be integral. */
  def prefixMax(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String, rangeSize: Long): DataFrame = {
    require(rangeSize > 0)
    val base = df.withColumn("__rng", floor(col(orderCol) / rangeSize).cast("long"))
    val wIn = Window.partitionBy(col("__rng")).orderBy(col(orderCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("__local", max(col(valueCol)).over(wIn))
    val totals = base.groupBy(col("__rng")).agg(max(col(valueCol)).as("__tot"))
    val offsets = totals.as("a")
      .join(broadcast(totals.select(col("__rng").as("__brng"), col("__tot").as("__btot"))),
        col("__brng") < col("a.__rng"), "left")
      .groupBy(col("a.__rng").as("__rng"))
      .agg(max(col("__btot")).as("__off"))
    local.join(broadcast(offsets), Seq("__rng"))
      .withColumn(outCol,
        when(col("__local").isNull, col("__off"))
          .when(col("__off").isNull, col("__local"))
          .otherwise(greatest(col("__local"), col("__off"))))
      .drop("__rng", "__local", "__off")
  }

  /** Two-stage fuzzy match (SURVEY §2.4 J7; reference
    * `match_to_contestant_season` `episodes/episodes_transform.py:218-240`):
    * exact join on the strong key; rows that miss retry on a weaker key;
    * results coalesced. Both stages are equi-joins, so each is
    * broadcast-able when `dim` is small.
    */
  def fuzzyTwoStageJoin(
      probe: DataFrame,
      dim: DataFrame,
      strongKey: (Column, Column),
      weakKey: (Column, Column),
      pick: Seq[String]): DataFrame = {
    // explicit match marker — testing pick.head for null would misroute a
    // genuine match whose picked column is legitimately null
    val dimStrong = broadcast(dim.select(
      (pick.map(col) :+ strongKey._2.as("__k1") :+ lit(true).as("__hit")): _*))
    val s1 = probe.join(dimStrong, strongKey._1 === col("__k1"), "left").drop("__k1")
    val hit = s1.filter(col("__hit")).drop("__hit")
    val miss = s1.filter(col("__hit").isNull).drop("__hit").drop(pick: _*)
    val dimWeak = broadcast(dim.select((pick.map(col) :+ weakKey._2.as("__k2")): _*))
    val s2 = miss.join(dimWeak, weakKey._1 === col("__k2"), "left").drop("__k2")
    hit.unionByName(s2.select(hit.columns.map(col).toSeq: _*))
  }
}
