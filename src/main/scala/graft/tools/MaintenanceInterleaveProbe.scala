package graft.tools

import graft.Sessions
import graft.sinks.UpsertWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Steal/maintenance-interaction probe at scale (r12 verdict directive
  * 6): the ×K write-scaling sequence ([[BucketedWriteProbe]]'s append
  * mode) with a [[UpsertWriter.compact]] interleaved MID-SEQUENCE in a
  * legal maintenance window (no drain running — compact takes the
  * maintenance lease itself), followed immediately by the REPLAY of the
  * just-folded batch tag — the crashed-drain hazard the folded-tags
  * sidecar exists to close, proven end-to-end at corpus scale rather
  * than in unit specs:
  *
  *  - the replayed append of a folded tag must report SKIPPED and leave
  *    the table byte-identical (no duplicate rows, checked by count +
  *    order-free content checksum against the source);
  *  - appends AFTER the fold land normally and stay ≈ flat per batch
  *    (the fold must not degrade the O(batch) ingest form);
  *  - the final table holds exactly the input key set (checksum vs the
  *    source rows — self-contained, no reference run needed).
  *
  * Prints one JSON line; non-zero exit on any violated invariant.
  * Usage: MaintenanceInterleaveProbe [sfDir] [nBatches] (default
  * /tmp/sf10, 24 — the ×100 corpus, 45.7M rows).
  */
object MaintenanceInterleaveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
    val numBuckets = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        concat_ws("|", col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_quantity")).as("v"))
      .dropDuplicates("id")
      .withColumn("__b", pmod(col("id"), lit(nBatches.toLong)).cast("int"))
      .persist()
    val total = rows.count()
    val srcChecksum = rows
      .agg(bit_xor(xxhash64(col("id"), col("v")))).head().getLong(0)

    def batch(i: Int): DataFrame =
      rows.filter(col("__b") === i).drop("__b")
        .withColumn("ver", lit(i.toLong))

    val path = Files.createTempDirectory("graft-interleave-probe")
      .resolve("t").toString
    val foldAt = nBatches / 2
    var compactSec = 0.0
    var replaySkipped = false
    var countStableAfterReplay = false
    val perBatchMs = (0 until nBatches).map { i =>
      val b = batch(i)
      val t0 = System.nanoTime()
      UpsertWriter.appendBucketed(spark, path, b,
        keys = Seq("id"), batchTag = s"b$i", numBuckets = numBuckets)
      val ms = (System.nanoTime() - t0) / 1000000L
      if (i == foldAt) {
        // legal maintenance window: nothing draining, compact takes
        // (and releases) the maintenance lease itself
        val c0 = System.nanoTime()
        UpsertWriter.compact(spark, path)
        compactSec = (System.nanoTime() - c0) / 1e9
        // the crashed-drain replay: batch b$i re-delivered AFTER the
        // compaction folded its delta files — must be a skipped no-op
        val nBeforeReplay = spark.read.parquet(path).count()
        replaySkipped = !UpsertWriter.appendBucketed(spark, path, b,
          keys = Seq("id"), batchTag = s"b$i", numBuckets = numBuckets)
        countStableAfterReplay =
          spark.read.parquet(path).count() == nBeforeReplay
      }
      ms
    }

    // SIDECAR BOUND (r13 verdict directive 1): the mid-sequence fold
    // recorded every folded batch tag; a final compact carrying the
    // replay horizon (every batch committed — the sequence is done)
    // must prune the sidecar to empty while the content stays
    // checksum-stable. This is the lifecycle that keeps the folded-tag
    // file O(replayable batches) on a long-lived table instead of
    // growing one line per batch forever.
    val sidecarAfterMidFold = UpsertWriter.foldedTags(path).size
    UpsertWriter.compact(spark, path,
      replayHorizon = Some(nBatches.toLong))
    val sidecarAfterHorizon = UpsertWriter.foldedTags(path).size
    val sidecarBounded =
      sidecarAfterMidFold > 0 && sidecarAfterHorizon == 0

    val finalDf = spark.read.parquet(path)
    val nFinal = finalDf.count()
    val finalChecksum = finalDf
      .agg(bit_xor(xxhash64(col("id"), col("v")))).head().getLong(0)
    val contentOk = nFinal == total && finalChecksum == srcChecksum
    // flatness across the fold: post-fold batches vs pre-fold batches
    def avg(ts: Seq[Long]): Double =
      ts.sum.toDouble / math.max(1, ts.size)
    val preFold = perBatchMs.slice(1, foldAt) // skip batch 0 (bootstrap)
    val postFold = perBatchMs.drop(foldAt + 1)
    val postOverPre = avg(postFold) / math.max(1.0, avg(preFold))

    val ok = contentOk && replaySkipped && countStableAfterReplay &&
      postOverPre < 2.0 && sidecarBounded
    println(s"""{"probe":"write_scaling_interleaved_compact",""" +
      s""""sf_dir":"$sfDir","rows":$total,"n_batches":$nBatches,""" +
      s""""buckets":$numBuckets,"fold_after_batch":$foldAt,""" +
      s""""per_batch_ms":[${perBatchMs.mkString(",")}],""" +
      f""""compact_sec":$compactSec%.1f,""" +
      s""""folded_tag_replay_skipped":$replaySkipped,""" +
      s""""count_stable_after_replay":$countStableAfterReplay,""" +
      s""""sidecar_tags_after_mid_fold":$sidecarAfterMidFold,""" +
      s""""sidecar_tags_after_horizon_compact":$sidecarAfterHorizon,""" +
      s""""sidecar_bounded":$sidecarBounded,""" +
      s""""final_checksum_matches_source":$contentOk,""" +
      f""""post_fold_over_pre_fold_avg":$postOverPre%.2f,""" +
      s""""ok":$ok}""")
    rows.unpersist()
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
