package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level timing probe for the minhash-edge pipeline behind
  * dedup_survivors / dedup_minhash: attributes the 75 MB shuffle and
  * tests a candidate-doc prefilter of the exploded shingle relation
  * before the verify joins (guide §2.3 / §3.2 — shuffle fewer bytes by
  * semi-joining the big side down to rows that can match).
  */
object DedupPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = LocalTool.sfDir
    val spark = LocalTool.session(sfDir)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    def t[A](tag: String)(f: => A): A = {
      Thread.sleep(100)
      val b0 = shuffleBytes.get
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(100)
      println(f"[phase] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        f"${(shuffleBytes.get - b0) / 1048576.0}%.1f MB")
      r
    }

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val d = if (round == 1) "/root/testdata/sf0.01" else sfDir
      val sets = Tables.documents(spark, d).select(
        col("doc_id"),
        call_function("word_shingles", col("text"), lit(3)).as("shingles"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("sets persist+count")(sets.count())
      val bands = graft.operators.DedupOps.bandSigs(sets, 32, 4)
      val cand = bands.as("x").hint("shuffle_hash")
        .join(bands.as("y").hint("shuffle_hash"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nCand = t("bands+candidates")(cand.count())
      println(s"  candidates: $nCand")

      // current form: jaccardPairs over the FULL exploded shingle rows
      t("jaccard FULL ex") {
        graft.operators.DedupOps.jaccardPairs(cand, sets, 0.8).count()
      }
      // prefiltered form: ex semi-joined down to docs that appear in a
      // candidate pair before any exchange
      t("jaccard PREFILTERED ex") {
        val docsIn = cand.select(col("doc_a").as("doc_id"))
          .unionByName(cand.select(col("doc_b").as("doc_id")))
          .distinct()
        val fsets = sets.join(broadcast(docsIn), Seq("doc_id"), "left_semi")
        graft.operators.DedupOps.jaccardPairs(cand, fsets, 0.8).count()
      }
      cand.unpersist(); sets.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
