package graft

import org.apache.spark.sql.functions._

import graft.core.{Bucketing, Tables}

/** Bucketed co-located joins: storing both sides bucketed on the join key
  * removes the per-query shuffle entirely — the write-once/join-many
  * trade that matters at 100 TB. */
class BucketingSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("join of two tables bucketed on the key has no shuffle exchange") {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name")

    Bucketing.writeBucketed(orders.withColumnRenamed("o_custkey", "custkey"),
      "b_orders", "custkey", 4)
    Bucketing.writeBucketed(customer.withColumnRenamed("c_custkey", "custkey"),
      "b_customer", "custkey", 4)

    // disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // same rows as the unbucketed join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("aggregation on the bucket key reuses the bucketing (no exchange)") {
    val orders = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Bucketing.writeBucketed(orders.withColumnRenamed("o_custkey", "custkey"),
      "b_orders2", "custkey", 4)
    try {
      val agg = spark.table("b_orders2")
        .groupBy("custkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
