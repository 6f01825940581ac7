package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd DotProduct expression must be bit-identical to the HOF
  * fold it replaced (which the DuckDB oracle replays), through both
  * engine paths, including null/length edge cases. */
class AnnEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("dot_product ≡ aggregate(zip_with(...)) on real embeddings, both codegen paths") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("a"))
    val pairs = e.toDF("id1", "a").crossJoin(
      e.toDF("id2", "b").limit(5))
    for (codegen <- Seq("true", "false")) {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val diff = pairs
          .select(expr("dot_product(a, b)").as("fast"), expr(hof).as("ref"))
          .filter(!($"fast" <=> $"ref"))
          .count()
        assert(diff == 0L, s"codegen=$codegen: $diff rows differ")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("dot_product null semantics match the HOF (null elements, length mismatch)") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),   // 11.0
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0))),        // length mismatch → null
      (None, Some(Seq(1.0))),                        // null array → null
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val out = df.select(
      expr("dot_product(a, b)").as("fast"), expr(hof).as("ref"))
    assert(out.filter(!($"fast" <=> $"ref")).count() == 0L)
    val withNullElem = spark.sql(
      "SELECT dot_product(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS v")
    assert(withNullElem.head().isNullAt(0))
  }

  test("GraftExtensions exposes the same builders as Sessions.tune registration") {
    val names = Functions.all.map(_._1).toSet
    assert(names == Set("parse_brl_money", "dot_product", "dsum_exact",
      "word_shingles", "nibble_histogram", "phash_pair", "frame_energy",
      "count_intersect", "bloom_agg", "bloom_might_contain",
      "freq_items_sketch", "shingle_explode"))
    // builders construct the right expression types
    import org.apache.spark.sql.catalyst.expressions.Literal
    val dp = Functions.all.toMap.apply("dot_product")(
      Seq(Literal.create(Array(1.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
        Literal.create(Array(2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    assert(dp.isInstanceOf[graft.functions.DotProduct])
  }
}
