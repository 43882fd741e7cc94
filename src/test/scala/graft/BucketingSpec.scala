package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the "pre-shuffle once, join many times free"
  * layout a 100 TB star schema wants: both sides bucketed by the join key
  * means repeated joins plan with ZERO exchanges.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Tables.orders(spark, sf("sf0.001"))
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sf("sf0.001"))
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        "bucketed sides must not re-shuffle on the join key")
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        "bucketed sides must not re-shuffle on the join key")

      // sanity: same result as the unbucketed join
      val plainCount = Tables.orders(spark, sf("sf0.001"))
        .join(Tables.customer(spark, sf("sf0.001")),
          col("o_custkey") === col("c_custkey")).count()
      val bucketCount = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey")).count()
      assert(plainCount == bucketCount)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
