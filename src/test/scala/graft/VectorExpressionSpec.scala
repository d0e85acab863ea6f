package graft

import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("graft_vec_dot is bitwise-identical to the zip_with+aggregate fold") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") < 20)
    val mismatches = pairs.select(
      Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
      Similarity.dotFold(col("a.embedding"), col("b.embedding")).as("fold"))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(mismatches == 0)
  }

  test("graft_vec_dot null semantics: length mismatch and null element -> null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot($"a", $"b")).collect().head
    assert(r.isNullAt(0))
    val withNull = spark.sql(
      "SELECT graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("simhashDF equals column-expression simhash") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val viaDF = graft.dedup.Dedup.simhashDF(docs, "doc_id", "text", 16)
    val viaCol = docs.select(col("doc_id"),
      graft.dedup.Dedup.simhash(col("text"), 16).as("sh"))
    assert(viaDF.join(viaCol.withColumnRenamed("sh", "sh2"), "doc_id")
      .filter(col("sh") =!= col("sh2")).count() == 0)
  }

  test("shingleRows equals array shingles") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val rows = graft.text.TextOps.shingleRows(docs, "doc_id", "text", 2)
      .groupBy("doc_id").agg(sort_array(collect_list(col("g"))).as("r"))
    val arrs = docs.select(col("doc_id"),
      sort_array(graft.text.TextOps.shingles(col("text"), 2)).as("a"))
    assert(rows.join(arrs, "doc_id").filter(col("r") =!= col("a")).count() == 0)
  }

  test("langIdDF equals column-expression langId") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents").limit(200)
    val viaDF = graft.text.TextOps.langIdDF(docs, "doc_id", "text")
    val viaCol = docs.select(col("doc_id"),
      graft.text.TextOps.langId(col("text")).as("lang2"))
    assert(viaDF.join(viaCol, "doc_id")
      .filter(col("lang_pred") =!= col("lang2")).count() == 0)
  }
}
