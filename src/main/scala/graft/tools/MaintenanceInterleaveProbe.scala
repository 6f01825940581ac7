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
  *    source rows — self-contained, no reference run needed);
  *  - (r15) the replay horizon is DERIVED from a worker-style
  *    checkpoint commits dir the probe maintains — the orchestrated
  *    path's own chain (commits → [[UpsertWriter.replayHorizon]] →
  *    prune), never a hand-passed constant: the mid-sequence fold's
  *    horizon must keep the uncommitted (replayable) batch's guard
  *    while pruning the dead ones, and the final metadata-only prune
  *    ([[UpsertWriter.pruneReplayMetadata]], what
  *    [[graft.Pipeline.runAnnIngestCycle]] schedules) must empty the
  *    sidecar once every batch has committed.
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

    val probeDir = Files.createTempDirectory("graft-interleave-probe")
    val path = probeDir.resolve("t").toString
    // a worker-style CHECKPOINT commits dir (one file per committed
    // batch id — exactly the layout Structured Streaming writes), so
    // the maintenance horizon is DERIVED the way the orchestrated path
    // derives it ([[UpsertWriter.replayHorizon]]), never hand-passed
    val ckpt = probeDir.resolve("ckpt").toString
    val commits = probeDir.resolve("ckpt").resolve("commits")
    Files.createDirectories(commits)
    def commitBatch(i: Int): Unit =
      Files.write(commits.resolve(i.toString), Array.emptyByteArray)
    val foldAt = nBatches / 2
    var compactSec = 0.0
    var replaySkipped = false
    var countStableAfterReplay = false
    var midHorizon = -1L
    var guardKeptForReplayable = false
    val perBatchMs = (0 until nBatches).map { i =>
      val b = batch(i)
      val t0 = System.nanoTime()
      UpsertWriter.appendBucketed(spark, path, b,
        keys = Seq("id"), batchTag = s"b$i", numBuckets = numBuckets)
      val ms = (System.nanoTime() - t0) / 1000000L
      if (i == foldAt) {
        // the CRASH story: batch foldAt's append landed but its
        // checkpoint commit did NOT (commits hold 0..foldAt-1), so the
        // batch is REPLAYABLE. The mid-sequence compact derives its
        // horizon from the checkpoint exactly as the orchestrated
        // maintenance cycle does — and that horizon (= foldAt) must
        // KEEP the replayable batch's folded-tag guard while remaining
        // free to prune everything older.
        val c0 = System.nanoTime()
        UpsertWriter.compact(spark, path,
          replayHorizon = UpsertWriter.replayHorizon(ckpt))
        compactSec = (System.nanoTime() - c0) / 1e9
        midHorizon = UpsertWriter.replayHorizon(ckpt).getOrElse(-1L)
        guardKeptForReplayable =
          UpsertWriter.foldedTags(path).contains(s"b$i")
        // the crashed-drain replay: batch b$i re-delivered AFTER the
        // compaction folded its delta files — must be a skipped no-op
        val nBeforeReplay = spark.read.parquet(path).count()
        replaySkipped = !UpsertWriter.appendBucketed(spark, path, b,
          keys = Seq("id"), batchTag = s"b$i", numBuckets = numBuckets)
        countStableAfterReplay =
          spark.read.parquet(path).count() == nBeforeReplay
      }
      commitBatch(i) // the batch's checkpoint commit lands AFTER its work
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
    // every batch has now committed, so the checkpoint-derived horizon
    // is nBatches and the ORCHESTRATED cheap path — the metadata-only
    // prune a scheduled cycle runs unconditionally
    // ([[UpsertWriter.pruneReplayMetadata]], wired into
    // [[graft.Pipeline.runAnnIngestCycle]]) — must empty the sidecar
    // without rewriting a byte of data
    val finalHorizon = UpsertWriter.replayHorizon(ckpt)
    finalHorizon.foreach(UpsertWriter.pruneReplayMetadata(path, _))
    val sidecarAfterHorizon = UpsertWriter.foldedTags(path).size
    val sidecarBounded =
      sidecarAfterMidFold > 0 && sidecarAfterHorizon == 0 &&
        midHorizon == foldAt.toLong && guardKeptForReplayable &&
        finalHorizon.contains(nBatches.toLong)

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
      s""""horizon_source":"checkpoint_commits",""" +
      s""""mid_fold_horizon":$midHorizon,""" +
      s""""replayable_guard_kept_by_mid_prune":$guardKeptForReplayable,""" +
      s""""sidecar_tags_after_mid_fold":$sidecarAfterMidFold,""" +
      s""""sidecar_tags_after_final_metadata_prune":$sidecarAfterHorizon,""" +
      s""""sidecar_bounded":$sidecarBounded,""" +
      s""""final_checksum_matches_source":$contentOk,""" +
      f""""post_fold_over_pre_fold_avg":$postOverPre%.2f,""" +
      s""""ok":$ok}""")
    rows.unpersist()
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
