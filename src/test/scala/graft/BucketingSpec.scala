package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed on the join key →
  * sort-merge join with ZERO Exchange (the 100 TB answer to repeated
  * fact-fact joins on the same key — shuffle paid once at write time). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-fact join plans without any shuffle") {
    val li = Tables.t(spark, "/root/testdata/sf0.001", "lineitem")
    val o = Tables.t(spark, "/root/testdata/sf0.001", "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must be exchange-free: the only Exchange allowed
      // is the one for the final groupBy
      val joinPart = plan.split("SortMergeJoin")(1)
      assert(plan.contains("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
