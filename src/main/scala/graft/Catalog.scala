package graft

import org.apache.spark.sql.SparkSession

/** SQL front door: registers every fixture table as a temp view and the
  * custom functions, so a user of the reference can run plain
  * `spark.sql(...)` against the same relations the DataFrame API sees —
  * "switch and run every query they run today" includes the ones they'd
  * rather keep in SQL. */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all fixture tables from `sfDir` as temp views (+ custom
    * SQL functions). Idempotent per session. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Sessions.tune(spark)
    tableNames.foreach { t =>
      val df = t match {
        case "events"     => Tables.events(spark, sfDir)
        case "documents"  => Tables.documents(spark, sfDir)
        case "embeddings" => Tables.embeddings(spark, sfDir)
        case other        => Tables.load(spark, sfDir, other)
      }
      df.createOrReplaceTempView(t)
    }
    // custom functions already registered by Sessions.tune above
  }
}
