package graft

import graft.functions.QuantizeMicros
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dsum_exact must be BIT-IDENTICAL to the decimal dsum pipeline it
  * accelerates — the quantizer against BigDecimal on millions of
  * adversarial doubles, and the whole aggregate against the decimal
  * form on real data across groupings and codegen paths. */
class ExactMoneySumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bigDecimalMicros(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  test("quantizer == BigDecimal HALF_UP scale-6 on adversarial doubles") {
    val rnd = new scala.util.Random(42)
    var checked = 0
    def check(x: Double): Unit = {
      assert(QuantizeMicros.quantize(x) == bigDecimalMicros(x),
        f"x=$x%.17g (bits ${java.lang.Double.doubleToLongBits(x)})")
      checked += 1
    }
    // dense sweep around half-micro boundaries (the rounding decision)
    for (k <- -2000L to 2000L; ulps <- -3 to 3) {
      val boundary = (k.toDouble + 0.5) / 1e6
      var x = boundary
      if (ulps > 0) (1 to ulps).foreach(_ => x = Math.nextUp(x))
      if (ulps < 0) (1 to -ulps).foreach(_ => x = Math.nextDown(x))
      check(x)
    }
    // random magnitudes across the money range
    for (_ <- 1 to 2000000) {
      val exp = rnd.nextInt(18) - 6 // 1e-6 .. 1e12
      val x = (rnd.nextDouble() - 0.5) * 2 * math.pow(10, exp)
      check(x)
    }
    // exact representables and extremes within the long-micros domain
    Seq(0.0, -0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 123456.654321,
      9.0e12, -9.0e12, 5.0e18 / 1e6, 0.0078125 /* exact 2^-7: a true tie */)
      .foreach(check)
    assert(checked > 2000000)
    // beyond ±~9.2e12 the micros exceed Long range: must fail LOUDLY
    // (like the ANSI decimal cast), never wrap silently
    intercept[ArithmeticException](QuantizeMicros.quantize(1.23456789e13))
    intercept[ArithmeticException](QuantizeMicros.quantize(Double.NaN))
  }

  test("dsum_exact == decimal dsum on every lineitem grouping, both codegen paths") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val exprs = Seq(
      col("l_quantity"),
      col("l_extendedprice"),
      col("l_extendedprice") * col("l_tax"),
      col("l_extendedprice") * (lit(1.0) - col("l_tax") - col("l_discount")))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        for ((e, i) <- exprs.zipWithIndex) {
          val fast = li.groupBy(col("l_partkey"))
            .agg(call_function("dsum_exact", e).as("s"))
          val ref = li.groupBy(col("l_partkey"))
            .agg(Exprs.dsumDecimal(e).as("s"))
          val joined = fast.toDF("k", "fast").join(ref.toDF("k", "ref"), "k")
          val diff = joined.filter(!(col("fast") <=> col("ref"))).count()
          assert(diff == 0L, s"expr #$i codegen=$codegen: $diff groups differ")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("empty-group and all-null semantics match decimal sum (NULL result)") {
    import spark.implicits._
    val df = Seq((1L, Some(2.5)), (1L, None), (2L, None))
      .toDF("k", "v")
    val out = df.groupBy($"k")
      .agg(call_function("dsum_exact", $"v").as("fast"), Exprs.dsumDecimal($"v").as("ref"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == (false, false))
    assert(out(2L) == (true, true), "all-null group must yield NULL like SUM")
  }
}
