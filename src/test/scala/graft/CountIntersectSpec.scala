package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.CountIntersect]] + [[graft.functions.IntersectSizeRewrite]]:
  * the fused count must agree with `size(array_intersect(...))` on every
  * multiset shape, and the optimizer rule must actually fire for the
  * graph plans that motivated it.
  */
class CountIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count_intersect == size(array_intersect) incl. duplicates and empties") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 1L, 2L, 2L), Seq(2L, 2L, 3L)),   // duplicates count once
      (Seq(5L, 1L, 3L), Seq(3L, 5L, 9L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MaxValue, Long.MinValue))
    ) ++ (1 to 50).map { _ =>
      (Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong),
        Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toLong))
    }
    val df = cases.toDF("a", "b").select(
      call_function("count_intersect", col("a"), col("b")).cast("long")
        .as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("composed"))
    val bad = df.filter(col("fused") =!= col("composed")).collect()
    assert(bad.isEmpty, s"divergent: ${bad.take(3).mkString(",")}")
  }

  test("the rewrite fires on the composed form (the edge-jaccard shape)") {
    // the graph query itself checkpoints its scored relation, so its
    // FINAL plan starts at a LogicalRDD — assert on the same expression
    // shape pre-checkpoint instead
    val df = spark.range(3).select(
      array(col("id"), col("id") + 1).as("a"),
      array(col("id") + 1, col("id") + 2).as("b"))
      .select(size(array_intersect(col("a"), col("b"))).cast("long").as("common"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("count_intersect"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("array_intersect("),
      "array_intersect survived the rewrite")
    assert(df.collect().forall(_.getLong(0) == 1L))
  }

  test("nullable-element arrays stay on the built-in path") {
    // array_intersect can emit a null element; the count must include it,
    // so the rule's type guard must NOT rewrite this shape
    val df = spark.range(1).select(
      size(array_intersect(
        expr("array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT))"),
        expr("array(CAST(NULL AS BIGINT), CAST(2 AS BIGINT))"))).as("n"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("count_intersect"))
    assert(df.collect().head.getInt(0) == 1) // the null element matches
  }
}
