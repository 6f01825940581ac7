package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (where ANSI-SQL can
  * express it) a DuckDB oracle twin run by the driver on the same parquet.
  * Column names must match between the two — every aggregate is aliased
  * identically on both sides.
  *
  * Row-order determinism lives OUTSIDE the measured plan: `sort` names the
  * key Verify applies before dumping parquet (matching the oracle's ORDER
  * BY), so Bench times the sort-free production plan while the driver's
  * row-by-row compare still sees a total order. Queries whose semantics
  * include an ORDER BY (top-k claims, ranks) keep it in the plan and leave
  * `sort` empty.
  */
final case class Q(
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    sort: Seq[String] = Nil)

trait OpModule {
  def queries: Map[String, Q]
}
