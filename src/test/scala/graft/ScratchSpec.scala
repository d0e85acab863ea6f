package graft

import org.apache.spark.sql.functions._

class ScratchSpec extends SparkSpec {
  test("scratch nb plan") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("x131_nb_langid")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println("==== EXECUTED PLAN ====")
    println(df.queryExecution.executedPlan.toString.take(8000))
  }
}
