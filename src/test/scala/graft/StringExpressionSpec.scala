package graft

import graft.expressions.JaroWinklerAlgo
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringExpressionSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("graft_jaro_winkler matches the pinned oracle-engine values") {
    // Values taken from DuckDB 1.x jaro_winkler_similarity — exact
    // doubles, not approximations; these pin the algorithm variant
    // (integer half-transpositions, prefix cap 4, boost only over 0.7,
    // empty -> 0.0).
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    // below the 0.7 boost threshold: prefix bonus must NOT apply
    assert(jw("abcdef", "abXXXX") == 0.5555555555555555)
    // 3-cycle: odd mismatch count counts as ONE transposition (int /2);
    // no boost (first chars differ -> prefix 0)
    assert(jw("abcXYZ", "bcaXYZ") == 0.9444444444444445)
    // prefix capped at 4 even with 6 common leading chars
    assert(jw("abcdefXYZW", "abcdefWZYX") == 0.96)
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("ab", "ba") == 0.0)
    assert(jw("aaaa", "aaaa") == 1.0)
  }

  test("codegen path equals interpreted eval") {
    val pairs = Seq(
      ("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("small ring", "small rung"),
      ("", ""), ("x", ""), ("identical", "identical"))
      .toDF("a", "b")
    val viaExpr = pairs
      .select($"a", $"b",
        call_function("graft_jaro_winkler", $"a", $"b").as("s"))
      .collect()
    viaExpr.foreach { r =>
      assert(r.getDouble(2) == jw(r.getString(0), r.getString(1)),
        s"codegen/eval mismatch on (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("null on either side -> null, via SQL registration") {
    val r = spark.sql(
      "SELECT graft_jaro_winkler(CAST(NULL AS STRING), 'x') AS a, " +
        "graft_jaro_winkler('x', CAST(NULL AS STRING)) AS b").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("graft_cdc_bounds equals the interpreted HOF boundary rule") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("text").isNotNull).limit(200)
    val hof =
      "IF(length(text) < 9, array(), " +
        "filter(sequence(8, length(text) - 1), i -> " +
        "aggregate(sequence(i - 7, i), CAST(0 AS BIGINT), " +
        "(acc, j) -> (acc * 31 + ascii(substring(text, j, 1))) " +
        "% 2147483647) % 32 = 0))"
    val mismatches = docs
      .select(col("doc_id"),
        call_function("graft_cdc_bounds", col("text")).as("fast"),
        expr(hof).cast("array<int>").as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
    // edge cases: empty, exactly window-size, null
    val edge = Seq(("", 1), ("abcdefgh", 2), ("abcdefghi", 3))
      .toDF("t", "i")
    val r = edge.select(call_function("graft_cdc_bounds", $"t")).collect()
    assert(r.forall(!_.isNullAt(0)))
    val nul = spark.sql(
      "SELECT graft_cdc_bounds(CAST(NULL AS STRING))").collect().head
    assert(nul.isNullAt(0))
  }

  test("symmetric and bounded in [0, 1] over corpus tokens") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = graft.text.TextOps.tokenRows(docs, "doc_id", "text")
      .filter(col("tok") =!= "").select("tok").distinct().limit(60)
    val pairs = toks.as("a").crossJoin(toks.as("b"))
      .select(col("a.tok").as("ta"), col("b.tok").as("tb"))
    val bad = pairs.select(
      call_function("graft_jaro_winkler", col("ta"), col("tb")).as("ab"),
      call_function("graft_jaro_winkler", col("tb"), col("ta")).as("ba"))
      .filter(col("ab") =!= col("ba") || col("ab") < 0.0 || col("ab") > 1.0)
      .count()
    assert(bad == 0)
  }
}
