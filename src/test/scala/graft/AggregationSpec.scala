package graft

import graft.functions.{SaleRow, SalesAgg}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SalesAgg ≡ five dsum aggregates, and the allocation/proration
  * arithmetic invariants from SURVEY §5 as scalacheck properties. */
class AggregationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SalesAgg matches the dsum pipeline on real data (sf0.001)") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val viaAgg = {
      val a = udaf(new SalesAgg, Encoders.product[SaleRow])
      li.groupBy($"l_returnflag")
        .agg(a($"l_quantity", $"l_extendedprice",
          $"l_extendedprice" * $"l_tax",
          $"l_extendedprice" * $"l_discount",
          $"l_extendedprice" * (lit(1.0) - $"l_tax" - $"l_discount")).as("s"))
        .select($"l_returnflag", $"s.sum_qtd", $"s.sum_fat", $"s.sum_tarifa",
          $"s.sum_frete", $"s.sum_liquido")
    }
    val viaDsum = li.groupBy($"l_returnflag")
      .agg(Exprs.dsum($"l_quantity"), Exprs.dsum($"l_extendedprice"),
        Exprs.dsum($"l_extendedprice" * $"l_tax"),
        Exprs.dsum($"l_extendedprice" * $"l_discount"),
        Exprs.dsum($"l_extendedprice" * (lit(1.0) - $"l_tax" - $"l_discount")))
    val a = viaAgg.orderBy($"l_returnflag").collect().map(_.toSeq)
    val b = viaDsum.orderBy($"l_returnflag").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // bit-identical, not approximate
  }

  test("property: Σ rounded int allocation within n/2 of parent; cap holds") {
    // Pure mirror of W1–W3: parent metric prorated by revenue shares,
    // int metrics rounded half-up, ads sales capped by totals.
    val gen = for {
      parent <- Gen.chooseNum(0, 100000)
      fats   <- Gen.nonEmptyListOf(Gen.chooseNum(0.01, 10000.0))
    } yield (parent, fats)
    val prop = Prop.forAll(gen) { case (parent, fats) =>
      val total = fats.sum
      val alloc = fats.map(f => math.round(parent * (f / total)))
      val drift = math.abs(alloc.sum - parent.toLong)
      drift <= (fats.size + 1) / 2
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: freight proration sums back to the order freight") {
    val gen = for {
      freight <- Gen.chooseNum(0.0, 1000.0)
      items   <- Gen.nonEmptyListOf(Gen.chooseNum(0.01, 10000.0))
    } yield (freight, items)
    val prop = Prop.forAll(gen) { case (freight, items) =>
      val total = items.sum
      val prorated = items.map(i => freight * (i / total))
      math.abs(prorated.sum - freight) < 1e-6 * math.max(freight, 1.0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("W5 guard: zero-revenue order allocates zero freight (no NaN)") {
    val df = Seq((1L, 0.0, 10.0), (1L, 0.0, 10.0)).toDF("ok", "fat", "frete")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"ok")
    val out = df
      .withColumn("fat_ordem", sum($"fat").over(w))
      .select(when($"fat_ordem" > 0.0, $"frete" * ($"fat" / $"fat_ordem"))
        .otherwise(lit(0.0)).as("rateado"))
      .as[Double].collect()
    assert(out.forall(_ == 0.0))
  }
}
