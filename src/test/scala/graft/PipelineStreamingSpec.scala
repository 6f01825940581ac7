package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pipeline.runStreaming end to end: the T4 queue-worker contract under a
  * KILLED-and-resumed query — exactly-once state through the checkpoint +
  * idempotent-upsert pair, with the dim enrichment applied per batch. */
class PipelineStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def addTaskFile(flat: String, base: java.nio.file.Path,
      name: String, rows: Seq[(Long, String)]): Unit =
    StreamFiles.landOne(base, flat, name, rows.toDF("task_id", "payload"))

  test("kill mid-drain, resume on the same checkpoint: every task acked exactly once, enriched") {
    val base = Files.createTempDirectory("graft-pipe-stream")
    val flat = base.resolve("queue").toString
    val wh = base.resolve("wh").toString
    val ckpt = base.resolve("ckpt").toString
    new java.io.File(flat).mkdirs()

    // eight single-task files → eight micro-batches at filesPerTrigger=1;
    // task_ids are real part keys so the dim enrichment joins non-null
    val partKeys = Tables.part(spark, sf).select(col("p_partkey"))
      .orderBy(col("p_partkey")).limit(8).as[Long].collect()
    partKeys.zipWithIndex.foreach { case (k, i) =>
      addTaskFile(flat, base, s"t$i", Seq((k, s"payload-$i")))
    }

    // run 1: kill as soon as at least one batch committed state
    val q1 = Pipeline.runStreaming(spark, sf, flat, wh, ckpt)
    val stateDir = s"$wh/queue_state"
    val deadline = System.currentTimeMillis() + 120000
    def committedRows(): Long =
      if (!Files.exists(java.nio.file.Paths.get(stateDir, "_SUCCESS"))) 0L
      else spark.read.parquet(stateDir).count()
    while (committedRows() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop()
    q1.awaitTermination(60000)
    val afterKill = committedRows()
    assert(afterKill >= 1, "run 1 never committed a batch")

    // run 2: resume on the SAME checkpoint, drain to completion
    val q2 = Pipeline.runStreaming(spark, sf, flat, wh, ckpt)
    q2.awaitTermination(120000)

    val state = spark.read.parquet(stateDir)
    val rows = state.select(col("task_id"), col("p_name"), col("status"))
      .as[(Long, String, String)].collect()
    // exactly once: every task present, no duplicates even though the
    // resumed query may replay the in-flight batch (same batch_id →
    // the upsert restates, never appends)
    assert(rows.map(_._1).toSet == partKeys.toSet, "missing tasks after resume")
    assert(rows.length == partKeys.length,
      s"duplicate acks: ${rows.length} rows for ${partKeys.length} tasks")
    // the per-batch dim enrichment ran: real part keys joined a name
    assert(rows.forall(r => r._2 != null && r._2.nonEmpty))
    assert(rows.forall(_._3 == "concluido"))
    // genuinely resumed: run 1 did not finish the queue (rate limit 1
    // file per trigger + the kill landed mid-drain)
    assert(afterKill < partKeys.length,
      s"kill landed after the full drain ($afterKill rows) — test proved nothing")
  }
}
