package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `shingle_explode` Generator must emit exactly the rows of the
  * composed `explode(word_shingles(text, n))` — same tokenizer truth,
  * different plan shape (rows born directly, no array column). */
class ShingleExplodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("generator rows == explode(word_shingles) rows on the documents fixture") {
    for (n <- Seq(3, 4)) {
      val docs = Tables.documents(spark, TestSpark.sf0001)
      val gen = docs.select(col("doc_id"),
        expr(s"shingle_explode(text, $n)").as("sh"))
      val composed = docs.select(col("doc_id"),
        explode(call_function("word_shingles", col("text"), lit(n))).as("sh"))
      assert(rowsOf(gen) == rowsOf(composed), s"n=$n diverged")
      // and per-doc multiplicity matches too (both emit DISTINCT shingles)
      assert(gen.count() == composed.count(), s"n=$n row counts diverged")
    }
  }

  test("generator matches composed form on adversarial inputs") {
    val cases = Seq(
      (1L, "  leading and trailing  "),
      (2L, "a b"), // shorter than n → no rows
      (3L, "x\ty\nz w x\ty"), // tabs/newlines in \s+, duplicate shingle
      (4L, "UPPER lower MiXeD case upper LOWER mixed CASE"),
      (5L, ""),
      (6L, " nbsp is not plain space  pad pad"),
      (7L, "rep rep rep rep rep rep")) // heavy duplication
    val df = cases.toDF("doc_id", "text")
    df.createOrReplaceTempView("adv_docs")
    val gen = df.select(col("doc_id"), expr("shingle_explode(text, 3)").as("sh"))
    val composed = df.select(col("doc_id"),
      explode(call_function("word_shingles", col("text"), lit(3))).as("sh"))
    assert(rowsOf(gen) == rowsOf(composed))
    assert(gen.count() == composed.count())
    // null text emits no rows, like explode of the null array
    val withNull = Seq((8L, Option.empty[String])).toDF("doc_id", "text")
    assert(withNull.select(col("doc_id"),
      expr("shingle_explode(text, 3)").as("sh")).count() == 0)
  }
}
