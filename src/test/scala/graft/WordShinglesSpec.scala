package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** The native word_shingles Expression must be BIT-IDENTICAL to the
  * composed HOF pipeline it replaces (which is what the DuckDB oracles
  * replay) — on the fixture corpus and on adversarial whitespace/unicode
  * edges, through both engine paths. */
class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def composed(n: Int) = {
    val parts = (0 until n).map(i => s"toks[i+$i]").mkString(", ' ', ")
    array_distinct(
      when(size(col("toks")) >= n,
        expr(s"transform(sequence(0, size(toks)-$n), i -> concat($parts))"))
        .otherwise(array().cast(ArrayType(StringType))))
  }

  private def bothWays(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    for (codegen <- Seq("true", "false")) {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try {
        val rows = df
          .withColumn("toks", split(trim(lower(col("text"))), "\\s+"))
          .select(
            composed(n).as("want"),
            expr(s"word_shingles(text, $n)").as("got"))
          .collect()
        rows.foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](0),
            s"codegen=$codegen n=$n: ${r.getSeq[String](1)} != ${r.getSeq[String](0)}")
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("equivalent to the composed HOF pipeline on the fixture corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001).select(col("text"))
    bothWays(docs, 3)
    bothWays(docs, 4)
  }

  test("equivalent on adversarial whitespace and unicode edges") {
    // trailing \n (Spark's split limit −1 keeps the trailing empty token;
    // Java String.split would drop it), 0x20-only trim, tabs, unicode
    // case mapping, short and empty strings
    val edges = Seq(
      "", "a", "a b", "  a  b  ", "a b\n", "\ta b", "a\tb\nc d",
      "Ä Ö Über STRASSE ß", "one two three four five",
      "x\u00A0y z w" // NBSP is NOT \s: stays inside a token
    ).toDF("text")
    bothWays(edges, 3)
  }
}
