package graft

import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

/** Co-bucketed fact⋈fact join: both exchanges elided (SURVEY §7 —
  * pay the shuffle once at write, skip it on every subsequent join). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("joining two co-bucketed tables plans no shuffle and no sort") {
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the non-broadcast path: the point is the exchange-free SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf), "b_orders", "o_custkey", buckets = 4)
      Bucketing.writeBucketed(
        Tables.customer(spark, sf), "b_customer", "c_custkey", buckets = 4)
      val joined = Bucketing.cobucketedJoin(
        spark, "b_orders", "o_custkey", "b_customer", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(600)}")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n${plan.take(900)}")
      // correctness: same rows as the plain join
      val o = Tables.orders(spark, sf)
      val c = Tables.customer(spark, sf)
      val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
