package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Data-profiling utility (generalizes the reference's ad-hoc
  * `isnull().sum()` gates, SURVEY §2.5 A5): one pass over the table
  * computing per-column null counts and approximate distinct counts.
  * All metrics ride a single aggregation — one job regardless of column
  * count, no per-column scans. */
object Profile {

  case class ColumnStats(column: String, nonNull: Long, nulls: Long,
                         approxDistinct: Long)

  def profile(df: DataFrame): Seq[ColumnStats] = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count(when(col(c).isNull, 1)).as(s"__n_$c"),
        approx_count_distinct(col(c)).as(s"__d_$c"))
    }
    val r: Row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    df.columns.toSeq.map { c =>
      ColumnStats(c,
        r.getAs[Long](s"__nn_$c"), r.getAs[Long](s"__n_$c"),
        r.getAs[Long](s"__d_$c"))
    }
  }
}
