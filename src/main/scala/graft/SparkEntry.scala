package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's verifiable queries. Each query name
  * carries the SURVEY.md §2 operator id it implements; `oracleSql` holds the
  * DuckDB-ANSI twin the driver runs on the same parquet fixtures.
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    operators.Consolidation,
    operators.RelationalOps,
    operators.IngestOps,
    operators.DedupOps,
    operators.AnnOps,
    operators.TextOps,
    operators.MultimodalOps,
    operators.IncrementalOps,
    operators.CustomFnOps,
    operators.AsofOps,
    operators.GraphOps,
    operators.LayoutOps,
    operators.StreamingIngestOps
  )

  private lazy val all: Map[String, Q] =
    modules.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    operators.Consolidation.relatorio(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) =>
      name -> { (s: SparkSession, d: String) =>
        Sessions.tune(s)
        q.run(s, d)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (name, q) if q.oracle.isDefined => name -> q.oracle.get }

  /** Determinism sort Verify applies before dumping (outside the measured
    * plan) — must mirror the oracle's ORDER BY. Empty = plan already ordered
    * (semantic top-k) or order-insensitive. */
  def sortKeys: Map[String, Seq[String]] =
    all.map { case (name, q) => name -> q.sort }
}
