package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** The point of bucketing is the PLAN: a join of two tables bucketed on
  * the join key must contain no Exchange (no shuffle on either side),
  * and it must still produce the same rows as the shuffle join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join runs with zero exchanges and exact results") {
    import spark.implicits._
    val orders = (1L to 2000L).map(i => (i % 97, i, s"o$i")).toDF("k", "oid", "otag")
    val items = (1L to 4000L).map(i => (i % 97, i, i * 1.5)).toDF("k", "iid", "amt")
    Bucketing.writeBucketed(orders, "b_orders", Seq("k"), numBuckets = 8)
    Bucketing.writeBucketed(items, "b_items", Seq("k"), numBuckets = 8)
    try {
      // force the sort-merge path so the exchange-elision is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_items", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and the result is exactly the shuffle join's
      val expected = orders.join(items, Seq("k")).count()
      assert(joined.count() === expected)
      val sample = joined.filter(col("k") === 13 && col("oid") === 13 && col("iid") === 110)
      assert(sample.count() === 1)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_items")
    }
  }

  test("mismatched bucket counts still join correctly (one side shuffles)") {
    import spark.implicits._
    val a = (1L to 500L).map(i => (i % 13, i)).toDF("k", "a")
    val b = (1L to 500L).map(i => (i % 13, i * 2)).toDF("k", "b")
    Bucketing.writeBucketed(a, "b_a", Seq("k"), numBuckets = 8)
    Bucketing.writeBucketed(b, "b_b", Seq("k"), numBuckets = 4)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_a", "b_b", Seq("k"))
      assert(joined.count() === a.join(b, Seq("k")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_a")
      spark.sql("DROP TABLE IF EXISTS b_b")
    }
  }
}
