package graft

import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join runs with zero exchanges (co-located, no shuffle)") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
      val dims = (0L until 50L).map(k => (k, s"name_$k")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "b_facts", Seq("k"), 8)
      Bucketing.writeBucketed(dims, "b_dims", Seq("k"), 8)

      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")

      // control: the same join over unbucketed frames DOES shuffle
      val control = facts.join(dims, Seq("k"))
      control.count()
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
