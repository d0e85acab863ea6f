package graft

import graft.ops.Relational
import graft.sources.GridTables
import org.apache.spark.sql.functions._

class GridTablesSpec extends SparkSpec {
  import spark.implicits._

  // A sheet shaped like the reference's box-score grids: a marker cell,
  // a header row below it, data rows until a gap in the anchor column.
  private val cells = Seq(
    // marker at (2,1); header row at row 3: name, Alice, Bob
    ("e1", 2, 1, "Tribal Council voting"),
    ("e1", 3, 1, "name"), ("e1", 3, 2, "Alice"), ("e1", 3, 3, "Bob"),
    ("e1", 3, 5, "orphan-after-gap"), // gap at col 4 ends the header run
    ("e1", 4, 1, "Carol"), ("e1", 4, 2, "X"),
    ("e1", 5, 1, "Dave"), ("e1", 5, 3, "X"),
    // gap at row 6 (no anchor cell) ends the table
    ("e1", 7, 1, "NotInTable"), ("e1", 7, 2, "zzz"))
    .toDF("sheet", "row", "col", "value")

  test("subtableAt extracts the rectangle bounded by header gap and row gap") {
    val sub = GridTables.subtableAt(cells, "^Tribal Council voting$")
    val got = sub.select("table_row", "header", "value")
      .as[(Int, String, Option[String])].collect().toSet
    assert(got == Set(
      (1, "name", Some("Carol")), (1, "Alice", Some("X")), (1, "Bob", None),
      (2, "name", Some("Dave")), (2, "Alice", None), (2, "Bob", Some("X"))))
  }

  test("unpivotVoteMatrix keeps only marked cells as votes") {
    val sub = GridTables.subtableAt(cells, "^Tribal Council voting$")
      .filter(col("header") =!= "name")
    val votes = GridTables.unpivotVoteMatrix(sub)
      .select("table_row", "voted_for").as[(Int, String)].collect().toSet
    assert(votes == Set((1, "Alice"), (2, "Bob")))
  }

  test("explodeMapOfLists emits one row per (key, value)") {
    val df = Seq(
      (1L, Map("alice" -> Seq("q1", "q2"), "bob" -> Seq("q3"))))
      .toDF("episode_id", "quotes")
    val out = Relational.explodeMapOfLists(df, "quotes", "speaker", "content")
      .orderBy("speaker", "content")
      .as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "alice", "q1"), (1L, "alice", "q2"), (1L, "bob", "q3")))
  }
}
