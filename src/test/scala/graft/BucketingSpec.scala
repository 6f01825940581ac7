package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Scale pattern: bucketed tables co-locate a big join — both sides
  * pre-hashed into the same bucket layout on the join key, so the join
  * runs with NO shuffle exchange on either side (SURVEY §7 posture; at
  * 100 TB this is the difference between a join that reshuffles the fact
  * table every run and one that never does). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans no shuffle exchange") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val o = Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))

    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    try {
      // disable broadcast so the join strategy must exploit bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n${plan.take(800)}")
      // and it still computes the right thing
      val n = joined.count()
      assert(n == Tables.lineitem(spark, TestSpark.sf0001).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
