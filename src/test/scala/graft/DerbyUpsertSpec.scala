package graft

import graft.ops.Upsert
import java.sql.DriverManager

/** Live-database round trip for the K1 upsert path (reference
  * `helpers/load_helpers.py:4-39`): stage via Spark's JDBC writer into an
  * EMBEDDED Derby database, run the dialect's one MERGE statement on a
  * driver connection, read back through spark.read.jdbc — the previously
  * fake-driven transport seam exercised end-to-end against a real engine. */
class DerbyUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftupsert;create=true"

  private def exec(sql: String): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.execute(sql); () } finally st.close()
    } finally conn.close()
  }

  private def readTable(table: String): Set[(Long, String, Long)] =
    spark.read.jdbc(url, table, new java.util.Properties)
      .selectExpr("k", "v", "cents")
      .as[(Long, String, Long)].collect().toSet

  test("insert → re-upsert → update round trip is idempotent on live Derby") {
    // quoted lower-case columns to match Spark's JDBC writer quoting;
    // unquoted table name (Spark embeds table names unquoted)
    exec("""CREATE TABLE target ("k" BIGINT PRIMARY KEY, "v" VARCHAR(32), "cents" BIGINT)""")
    val sink = new Upsert.JdbcUpsertSink(url)

    val batch1 = Seq((1L, "a", 100L), (2L, "b", 250L)).toDF("k", "v", "cents")
    val sql = Upsert.viaTempTable(batch1, sink, "target", Seq("k"),
      dialect = Upsert.AnsiMerge)
    assert(sql.startsWith("MERGE INTO target t USING target_staging s"))
    assert(readTable("target") == Set((1L, "a", 100L), (2L, "b", 250L)))

    // replay the SAME batch — the idempotence contract (at-least-once
    // delivery upstream must be a no-op here)
    Upsert.viaTempTable(batch1, sink, "target", Seq("k"),
      dialect = Upsert.AnsiMerge)
    assert(readTable("target") == Set((1L, "a", 100L), (2L, "b", 250L)))

    // mixed batch: update k=2, insert k=3, and an intra-batch duplicate of
    // k=3 whose survivor must be the latest under the default tiebreak
    val batch2 = Seq((2L, "b2", 300L), (3L, "c", 10L), (3L, "c", 999L))
      .toDF("k", "v", "cents")
    Upsert.viaTempTable(batch2, sink, "target", Seq("k"),
      dialect = Upsert.AnsiMerge)
    assert(readTable("target") ==
      Set((1L, "a", 100L), (2L, "b2", 300L), (3L, "c", 999L)))
  }

  test("generated MERGE quotes columns, and matches the staged reality on Derby") {
    val stmt = Upsert.AnsiMerge.statement("t", "t_staging",
      Seq("k", "v"), Seq("k"))
    assert(stmt ==
      """MERGE INTO t t USING t_staging s ON (t."k" = s."k") """ +
        """WHEN MATCHED THEN UPDATE SET "v" = s."v" """ +
        """WHEN NOT MATCHED THEN INSERT ("k", "v") VALUES (s."k", s."v")""")
  }

  test("key-only table renders insert-only MERGE (conflict = no-op) and runs") {
    exec("""CREATE TABLE keyset ("k" BIGINT PRIMARY KEY)""")
    val sink = new Upsert.JdbcUpsertSink(url)
    val stmt = Upsert.viaTempTable(Seq(1L, 2L).toDF("k"), sink, "keyset",
      Seq("k"), dialect = Upsert.AnsiMerge)
    assert(!stmt.contains("WHEN MATCHED"))
    Upsert.viaTempTable(Seq(2L, 3L).toDF("k"), sink, "keyset",
      Seq("k"), dialect = Upsert.AnsiMerge) // overlap: no-op, no error
    val got = spark.read.jdbc(url, "keyset", new java.util.Properties)
      .selectExpr("k").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }
}
