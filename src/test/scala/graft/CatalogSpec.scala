package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: temp views + custom functions reachable from
  * plain spark.sql. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("all fixture tables query from SQL, custom function included") {
    Catalog.registerAll(spark, TestSpark.sf0001)
    val n = spark.sql(
      """SELECT count(*) AS n
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE parse_brl_money('1,5') = 1.5""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    Catalog.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1L, s"view $t")
    }
  }

  test("custom generator runs from SQL via LATERAL VIEW") {
    Catalog.registerAll(spark, TestSpark.sf0001)
    val gen = spark.sql(
      """SELECT doc_id, sh FROM documents
        |LATERAL VIEW shingle_explode(text, 3) t AS sh""".stripMargin).count()
    val composed = spark.sql(
      "SELECT doc_id, explode(word_shingles(text, 3)) FROM documents").count()
    assert(gen == composed && gen > 0)
  }
}
