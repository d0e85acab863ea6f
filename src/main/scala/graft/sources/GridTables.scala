package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's Excel grid sub-table scan (SURVEY §2.1 S3;
  * `extract_subtable` episode_stats/episode_stats_extract.py:137-190)
  * re-expressed relationally.
  *
  * Input model: a bronze cell matrix — one row per non-empty cell
  * (sheet, row, col, value) — produced by whatever staged the xlsx (the
  * grid logic itself is engine-side and format-agnostic; the same op
  * serves CSV grids, HTML tables, OCR output).
  *
  * [[subtableAt]] mirrors the reference semantics: a marker cell anchors a
  * rectangle; the header row is the marker row (or the row below), columns
  * extend right until the first gap in the header row, data rows extend
  * down until the first empty anchor-column cell (the reference's
  * "stop condition"). All predicates are windows over the cell rows — no
  * driver-side cell cursor, so a million-sheet bronze layer fans out
  * across the cluster.
  */
object GridTables {

  /** Cells of the header row for each marker: marker cells are located by
    * regex, then header cells are those on the marker's row, at or right of
    * the marker column, with no gap between them and the marker. */
  def subtableAt(cells: DataFrame, markerPattern: String,
                 headerRowOffset: Int = 1): DataFrame = {
    val markers = cells
      .filter(regexp_extract(col("value"), markerPattern, 0) =!= "")
      .select(col("sheet"), col("row").as("m_row"), col("col").as("m_col"),
        col("value").as("marker"))

    // header cells: contiguous run rightward from the marker column on the
    // header row (first gap ends the run — detect via col-index vs rank)
    val hdr = cells.as("c").join(markers.as("m"),
        col("c.sheet") === col("m.sheet") &&
          col("c.row") === col("m.m_row") + headerRowOffset &&
          col("c.col") >= col("m.m_col"))
      .select(col("c.sheet"), col("m.m_row"), col("m.m_col"), col("m.marker"),
        col("c.col").as("h_col"), col("c.value").as("header"))
    val wHdr = Window.partitionBy(col("sheet"), col("m_row"), col("m_col"))
      .orderBy(col("h_col"))
    val contiguous = hdr
      .withColumn("rk", row_number().over(wHdr))
      .filter(col("h_col") - col("m_col") === col("rk") - 1)

    // data rows: below the header, keyed on the anchor (marker) column;
    // a row belongs to the table while the anchor column is populated and
    // no gap row intervenes (rank-vs-offset again, on distinct rows)
    val anchorCells = cells.as("c").join(markers.as("m"),
        col("c.sheet") === col("m.sheet") &&
          col("c.col") === col("m.m_col") &&
          col("c.row") > col("m.m_row") + headerRowOffset)
      .select(col("c.sheet"), col("m.m_row"), col("m.m_col"),
        col("c.row").as("d_row"))
    val wRows = Window.partitionBy(col("sheet"), col("m_row"), col("m_col"))
      .orderBy(col("d_row"))
    val tableRows = anchorCells
      .withColumn("rk", row_number().over(wRows))
      .filter(col("d_row") - (col("m_row") + headerRowOffset) === col("rk"))

    // values: cross header columns with table rows, left-join the cells
    tableRows.as("tr")
      .join(contiguous.as("h"),
        Seq("sheet", "m_row", "m_col"))
      .join(cells.as("v"),
        col("v.sheet") === col("tr.sheet") &&
          col("v.row") === col("tr.d_row") &&
          col("v.col") === col("h.h_col"), "left")
      .select(col("tr.sheet"), col("h.marker"),
        col("tr.rk").as("table_row"),
        col("h.header"),
        col("v.value"))
  }

  /** The reference's wide-vote-matrix unpivot (S3 + O5 composed,
    * `vote_extract_values` episode_stats/episode_stats_extract.py:107-134):
    * a sub-table whose headers are candidate names and whose non-null cells
    * mark votes becomes long rows (voter row, candidate, vote_counted). */
  def unpivotVoteMatrix(subtable: DataFrame): DataFrame =
    subtable
      .select(col("sheet"), col("marker"), col("table_row"),
        col("header").as("voted_for"),
        col("value").isNotNull.as("vote_counted"))
      .filter(col("vote_counted"))
}
