package graft

import graft.operators.CustomFnOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Equivalence of the custom [[graft.functions.ParseBrlMoney]] Expression
  * with the built-in `translate + cast` pipeline — through BOTH engine
  * paths (whole-stage codegen on and off), and on generated money
  * strings plus edge cases. (Raw scalacheck: the scalatest bridge isn't
  * in the offline dependency cache.) */
class ParseBrlMoneySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(inputs: Seq[String], codegen: Boolean): Seq[Option[Double]] = {
    CustomFnOps.registerParseBrlMoney(spark)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
    try {
      inputs.toDF("s")
        .select(expr("parse_brl_money(s)").as("v"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  private def builtin(inputs: Seq[String]): Seq[Option[Double]] =
    inputs.toDF("s")
      .select(translate($"s", ",", ".").cast(DoubleType).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("edge cases: plain, comma, negative, garbage, empty, whitespace") {
    val in = Seq("1234,56", "0,99", "-3,5", "100", "abc", "", "  7,5  ", "1,2,3")
    val expected = Seq(Some(1234.56), Some(0.99), Some(-3.5), Some(100.0),
      None, None, Some(7.5), None)
    assert(run(in, codegen = true) == expected)
    assert(run(in, codegen = false) == expected)
  }

  test("Java-only numeric forms parse as NULL (intentional cast divergence)") {
    // Spark's string→double cast accepts all of these (Java parsing);
    // a money parser must not, and DuckDB's TRY_CAST agrees with us.
    val javaOnly = Seq("0x1.8p3", "12,34d", "12,34f", "NaN", "Infinity", "-Infinity")
    assert(run(javaOnly, codegen = true) == Seq.fill(6)(None))
    assert(run(javaOnly, codegen = false) == Seq.fill(6)(None))
    assert(builtin(javaOnly).forall(_.isDefined),
      "premise: the built-in cast really does accept Java-only forms")
    // still inside the decimal grammar (and the built-in cast agrees):
    val decimal = Seq("1e3", ",5", "5,")
    val expected = Seq(Some(1000.0), Some(0.5), Some(5.0))
    assert(run(decimal, codegen = true) == expected)
    assert(run(decimal, codegen = false) == expected)
    assert(builtin(decimal) == expected)
  }

  test("property: matches translate+cast on well-formed money strings") {
    val money: Gen[String] = for {
      int   <- Gen.chooseNum(0L, 99999999L)
      cents <- Gen.chooseNum(0, 99)
      neg   <- Gen.oneOf("", "-")
    } yield f"$neg$int%d,$cents%02d"
    val prop = Prop.forAll(Gen.listOfN(30, money)) { strs =>
      run(strs, codegen = true) == builtin(strs)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
