package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The deployment path: a session built with
  * `.withExtensions(new GraftExtensions)` — NOT via `Sessions.tune` —
  * must get the custom functions, the similarity-join planner strategy,
  * and the threshold-pushdown rule purely from the injection. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions injects functions, strategy, and optimizer rule") {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "premise: a fresh session, not the tuned one")

      // injectFunction
      assert(s2.sql("SELECT parse_brl_money('1234,56') AS v")
        .head().getDouble(0) == 1234.56)

      // injectPlannerStrategy
      val df = plans.SimilarityJoin(
        Tables.documents(s2, TestSpark.sf0001), "doc_id", "text")
      assert(df.queryExecution.sparkPlan
        .exists(_.isInstanceOf[plans.SimilarityJoinExec]),
        "strategy must come from the extension injection")

      // injectOptimizerRule
      val pushed = df.filter(col("jaccard") >= 0.9)
        .queryExecution.optimizedPlan
        .collect { case sj: plans.SimilarityJoinPlan => sj }
      assert(pushed.nonEmpty && pushed.head.threshold == 0.9,
        "pushdown rule must come from the extension injection")
      // s2 shares the SparkContext — never stop() it here
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
