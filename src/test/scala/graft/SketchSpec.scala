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

  test("sk3: approx quantiles within GK rank-error bound of the exact values") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk3_approx_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // GK with accuracy a guarantees rank error ≤ n/a — but the sketch
    // returns an actual data value while `percentile` interpolates
    // between neighbors, so the window needs slack beyond 1/a for the
    // interpolation gap. 0.005 (≈ half a percentile) is still far
    // tighter than any plausible sketch failure.
    val eps = 0.005
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5 - eps)).as("lo50"),
        percentile(col("l_extendedprice"), lit(0.5 + eps)).as("hi50"),
        percentile(col("l_extendedprice"), lit(0.9 - eps)).as("lo90"),
        percentile(col("l_extendedprice"), lit(0.9 + eps)).as("hi90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (a50, a90)) <- approx) {
      val (lo50, hi50, lo90, hi90) = exact(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k median $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$k p90 $a90 outside [$lo90,$hi90]")
    }
  }

  test("sk4: merged HLL sketches estimate within 5% of exact distinct at the coarse grain") {
    val sf = TestSpark.sf0001
    val merged = SparkEntry.queries("sk4_hll_merge_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((k, e) <- exact)
      assert(math.abs(merged(k) - e) / e < 0.05, s"$k: ${merged(k)} vs $e")
  }
}
