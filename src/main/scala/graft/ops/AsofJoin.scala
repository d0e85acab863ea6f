package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward nearest; SURVEY §2.4 J4; reference `pd.merge_asof`
  * at `reddit/reddit_transform.py:12-25`): for each probe row, attach the
  * columns of the most recent build row with `build.ts <= probe.ts`
  * (per key, if keys are given).
  *
  * Algorithm (scale-first): union-tag both sides, then one window pass
  * per key ordered by (ts, side) carrying the last non-null build payload
  * forward. Cost = ONE shuffle on the key + a sort within partitions —
  * no range-explosion, no broadcast requirement, no skew beyond what the
  * key distribution itself has. This is the plan you want at 100 TB: it is
  * exactly the cost of a sort-merge join on the same key.
  *
  * Tie semantics: a build row at exactly probe.ts matches (<=), and among
  * equal-ts build rows the one latest under `buildTiebreak` wins —
  * deterministic, unlike merge_asof on unsorted duplicates.
  */
object AsofJoin {

  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTs: String,
      buildTs: String,
      payload: Seq[String],
      buildTiebreak: Seq[Column] = Nil): DataFrame = {

    val probeCols = probe.columns.toSeq
    val pTagged = probe
      .withColumn("__ts", col(probeTs))
      .withColumn("__side", lit(1)) // probe sorts after build at equal ts

    // Carry the build payload as one struct column so a single
    // last(_, ignoreNulls) suffices regardless of payload width.
    val bTagged = build
      .withColumn("__ts", col(buildTs))
      .withColumn("__side", lit(0))
      .select(
        (keys.map(col) :+ col("__ts") :+ col("__side") :+
          struct(payload.map(col): _*).as("__b")) ++
          buildTiebreak.zipWithIndex.map { case (c, i) => c.as(s"__tb_$i") }: _*)

    val tbCols = buildTiebreak.indices.map(i => s"__tb_$i")
    val pSide = pTagged
      .select(
        (probeCols.map(col) :+ col("__ts") :+ col("__side") :+
          lit(null).cast(bTagged.schema("__b").dataType).as("__b")) ++
          // null placeholders keep the tiebreaks' ORIGINAL types — casting
          // to string would make numeric tiebreaks order lexicographically
          tbCols.map(c => lit(null).cast(bTagged.schema(c).dataType).as(c)): _*)
    val bSide = bTagged
      .select(
        (probeCols.map(c => if (keys.contains(c)) col(c) else lit(null).cast(probe.schema(c).dataType).as(c)) :+
          col("__ts") :+ col("__side") :+ col("__b")) ++
          tbCols.map(col): _*)

    val ordering: Seq[Column] =
      (col("__ts").asc +: col("__side").asc +: tbCols.map(c => col(c).asc))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = pSide
      .unionByName(bSide)
      .withColumn("__match", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = payload.foldLeft(joined) { (d, p) =>
      d.withColumn(p, col("__match").getField(p))
    }
    out.select((probeCols ++ payload).map(col): _*)
  }
}
