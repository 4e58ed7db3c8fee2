package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).select($"o_orderkey", $"o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sfDir).select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
        "lineitem_b", "o_orderkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() === Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
