package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (where ANSI-SQL can
  * express it) a DuckDB oracle twin run by the driver on the same parquet.
  * Column names and row order must match between the two — every aggregate
  * is aliased identically on both sides and both sides ORDER BY the full
  * output key (FIXTURES.md "Determinism").
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait OpModule {
  def queries: Map[String, Q]
}
