package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end daily pipeline: two consecutive runs against the same
  * warehouse must RESTATE the mart (idempotent upsert), not duplicate
  * it, and the stored state must equal the registered query's result —
  * the switch-from-the-reference acceptance test. */
class PipelineE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two daily runs restate the mart and key the alerts; state matches the query") {
    val wh = Files.createTempDirectory("graft-pipeline").toString
    val sf = TestSpark.sf0001

    Pipeline.runDaily(spark, sf, wh, runVersion = 1L)
    val afterFirst = spark.read.parquet(s"$wh/relatorio_diario").count()

    // the cron fires again (same upstream day): restatement, not growth
    Pipeline.runDaily(spark, sf, wh, runVersion = 2L)
    val mart = spark.read.parquet(s"$wh/relatorio_diario")
    assert(mart.count() == afterFirst, "second run must not duplicate rows")
    assert(mart.select(max($"run_version")).head().getLong(0) == 2L)

    // stored state ≡ the registered (oracle-verified) query result
    val expected = SparkEntry.queries("ep1_consolidar_relatorio")(spark, sf)
    val key = Seq("id_anuncio", "id_anuncio_variacao")
    val diff = mart.drop("run_version")
      .join(expected, key, "full_outer")
      .filter(expected("faturamento_total").isNull ||
        mart("faturamento_total").isNull ||
        !(mart("faturamento_total") <=> expected("faturamento_total")))
    assert(diff.count() == 0, "warehouse state diverges from the query result")

    // alerts: keyed per part — re-runs update in place
    val alerts = spark.read.parquet(s"$wh/alerts")
    assert(alerts.count() ==
      alerts.select("alert_key").distinct().count(), "alerts must be keyed")
    assert(alerts.select(max($"run_version")).head().getLong(0) == 2L)
    assert(alerts.filter($"status" === "OPEN").count() == alerts.count())
  }
}
