package graft

import graft.ops.Extract
import org.apache.spark.sql.functions._

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  test("regexFieldBank: first matching alternate wins, null when none") {
    val bank = Seq(
      "age" -> Seq("Age: (\\d+)", "(\\d+) years old"),
      "home" -> Seq("Hometown: (\\w+)"))
    val df = Seq(
      "Age: 34 Hometown: Boston",
      "He is 27 years old",
      "no fields here").toDF("text")
    val out = df.select(Extract.regexFieldBank($"text", bank).as("f"))
      .select($"f.age", $"f.home")
      .as[(Option[String], Option[String])].collect().toSeq
    assert(out == Seq(
      (Some("34"), Some("Boston")), (Some("27"), None), (None, None)))
  }

  test("replaceChain applies rules in order") {
    val rules = Seq("Rob M\\." -> "Rob Mariano", "Rob" -> "Robert")
    val out = Seq("Rob M. voted").toDF("t")
      .select(Extract.replaceChain($"t", rules)).as[String].collect().head
    // first rule rewrites to "Rob Mariano", second then hits the prefix
    assert(out == "Robert Mariano voted")
  }

  test("mappingJoin canonicalizes via broadcast table, passthrough otherwise") {
    val df = Seq((1, "J.T."), (2, "Alice")).toDF("id", "name")
    val mapping = Seq(("J.T.", "James Thomas")).toDF("dirty", "canonical")
    val out = Extract.mappingJoin(df, "name", mapping, "dirty", "canonical")
      .orderBy("id").select("name").as[String].collect().toSeq
    assert(out == Seq("James Thomas", "Alice"))
  }

  test("namemap.csv asset matches the in-code entries the oracle inlines (no drift)") {
    val csv = spark.read.option("header", "true").csv("data/namemap.csv")
      .select("dirty", "canonical").as[(String, String)].collect().toSeq
    assert(csv == graft.queries.CoreQueries.nameMapEntries)
    assert(csv.map(_._1).distinct.size == csv.size, "duplicate dirty keys")
  }

  test("fix chain + mapping compose: chained key hits the map, unmapped pass through") {
    val mapping = graft.queries.CoreQueries.nameMapEntries.toDF("dirty", "canonical")
    val df = Seq((7L, "Customer#000000007"), (8L, "Customer#000000008"))
      .toDF("id", "name")
    val chained = df.withColumn("name",
      Extract.replaceChain($"name", graft.queries.CoreQueries.nameFixChain))
    val out = Extract.mappingJoin(chained, "name", mapping, "dirty", "canonical")
      .orderBy("id").select("name").as[String].collect().toSeq
    assert(out == Seq("rupert boneham", "c8"))
  }
}
