package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sketch query has no oracle twin (HLL++ is engine-specific by
  * design), so its correctness contract lives here: every approximate
  * count within 5% of the exact distinct count (HLL++ default rsd is
  * 0.05; the fixture cardinalities sit well inside it). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sk1: approx distinct counts within 5% of exact on the fixture") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk1_hll_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (eo, ep)) <- exact) {
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
    }
  }
}
