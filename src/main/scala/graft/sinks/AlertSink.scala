package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K7: the alert side output, written end-to-end.
  *
  * The reference accumulates one message per unmapped SKU during map
  * consolidation and mails the batch to a fixed address
  * (tarefa_consolidar_mapa.php:77, 88-102) — sending the same failure
  * again on every rerun until someone fixes the catalog. Re-expressed as
  * a sink: the anti-join output ([[graft.operators.RelationalOps]] `j6`)
  * lands in a keyed `alerts` table via [[UpsertWriter]], so a rerun
  * UPDATES the open alert for that SKU (bumping `run_version`) instead of
  * duplicating it — the keyed-dedup equivalent of "one email thread per
  * failure". Delivery (the reference's `mail()`) is a downstream consumer
  * reading the table; persisting, not transport, is the operator.
  */
object AlertSink {

  /** Upsert unmapped-part alerts. `unmapped` is the anti-join output with
    * columns (p_partkey, p_name, p_brand); `runVersion` identifies the
    * consolidation run (latest run wins per key). */
  def emit(
      spark: SparkSession,
      path: String,
      unmapped: DataFrame,
      runVersion: Long): Unit = {
    val alerts = unmapped.select(
      col("p_partkey").as("alert_key"),
      concat(
        lit("Part '"), col("p_name"), lit("' (brand "), col("p_brand"),
        lit(", key "), col("p_partkey"),
        lit(") has no qualifying lineitem mapping.")).as("message"),
      lit("OPEN").as("status"),
      lit(runVersion).as("run_version"))
    UpsertWriter.upsert(spark, path, alerts,
      keys = Seq("alert_key"), versionCol = "run_version")
  }
}
