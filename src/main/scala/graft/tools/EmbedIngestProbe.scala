package graft.tools

import graft.{Pipeline, Sessions}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Measures [[graft.streaming.EmbedIngest]]'s batch-proportionality
  * claim: drain MANY equal-size batches while the stored corpus grows
  * from zero, and record each micro-batch's engine-reported duration.
  * If per-ingest work is batch×batch + batch×corpus CELL COLLISIONS
  * (occupancy held ≈ constant by the widening mask), the per-batch
  * wall stays ≈ flat as the corpus grows; a quadratic corpus term
  * would show as a monotone climb. The mask WIDENS twice over the run
  * (200 arrivals/batch: 3 bits at batch 0 → 6 bits by the last), so
  * the flatness also exercises re-masking under growth.
  *
  * Usage: EmbedIngestProbe <sfDir> [nBatches] — splits the fixture's
  * embeddings round-robin by vec_id into nBatches equal files (mtime
  * = batch order), drains one worker AvailableNow, prints one JSON
  * line from `StreamingQuery.recentProgress`.
  */
object EmbedIngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "4") // state-sized drain
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft-embed-probe")
    val flat = base.resolve("in").toString
    new java.io.File(flat).mkdirs()
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val t0 = System.currentTimeMillis() - nBatches * 60000L
    for (b <- 0 until nBatches) {
      val tmp = base.resolve(s"b$b.tmp").toString
      vecs.filter(pmod(col("vec_id"), lit(nBatches)) === b)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(s"$flat/b$b.parquet")
      Files.move(part.toPath, target.toPath)
      target.setLastModified(t0 + b * 60000L)
    }

    val q = Pipeline.runEmbedIngest(spark, flat,
      base.resolve("wh").toString, base.resolve("ckpt").toString)
    require(q.awaitTermination(600000), "probe drain did not finish")
    val prog = q.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .sortBy(_.batchId)
      .map(p => (p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L)))
    val per = prog.map { case (b, n, ms) =>
      s"""{"batch":$b,"rows":$n,"trigger_ms":$ms}"""
    }.mkString("[", ",", "]")
    val head = prog.take(3).map(_._3)
    val tail = prog.takeRight(3).map(_._3)
    val ratio =
      if (head.nonEmpty && head.min > 0)
        tail.sum.toDouble / tail.size / (head.sum.toDouble / head.size)
      else -1.0
    println(s"""{"metric":"embed_ingest_probe","n_batches":${prog.size},""" +
      s""""per_batch":$per,""" +
      f""""last3_over_first3":$ratio%.2f}""")
    spark.stop()
  }
}
