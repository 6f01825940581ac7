package graft

import graft.streaming.MultiSignalIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Pipeline.runMultiSignalIngest end to end: one worker, both signals.
  * The load-bearing scenario is the MIXED CHAIN — a lexical edge and a
  * semantic edge sharing a middle document collapse three docs into
  * one cluster within a batch, which neither single-signal worker can
  * do — plus corpus drops through EITHER signal (a new text whose
  * vector paraphrases a stored doc drops; a new vector whose text
  * copies a stored doc drops), kill/resume restating, and the
  * admission log. */
class MultiSignalIngestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 30 distinct words from one vocabulary (NearDupIngestStreamSpec's
    * construction): variants replacing the last word sit at 3-gram
    * Jaccard ≈ 0.93 ≥ 0.8; distinct vocabularies share zero shingles. */
  private def text(prefix: String, lastWord: String = ""): String = {
    val ws = (1 to 29).map(i => s"$prefix$i") :+
      (if (lastWord.isEmpty) s"${prefix}30" else lastWord)
    ws.mkString(" ")
  }

  /** Unit vector along `i` with an `eps` leak onto `j`
    * (EmbedIngestStreamSpec's construction): ε-leaked copies sit at
    * cos ≈ 0.995 ≥ 0.4; distinct axes at cos ≈ ε ≪ 0.4. At ≤ 32 total
    * vectors the occupancy mask is 0 bits — one cell, exhaustive
    * candidates. */
  private def vec(i: Int, j: Int = -1, eps: Float = 0f): Seq[Float] =
    Seq.tabulate(64)(d => if (d == i) 1f else if (d == j) eps else 0f)

  private def addFile(flat: String, base: java.nio.file.Path, name: String,
      rows: Seq[(Long, String, Seq[Float])]): Unit =
    StreamFiles.landOne(base, flat, name,
      rows.toDF("doc_id", "text", "embedding"))

  test("mixed chain collapses in-batch; corpus drops through either signal; kill/resume restates") {
    val base = Files.createTempDirectory("graft-ms-stream")
    val flat = base.resolve("in").toString
    val wh = base.resolve("wh").toString
    val ckpt = base.resolve("ckpt").toString
    new java.io.File(flat).mkdirs()

    // f0 — the MIXED CHAIN: 11 and 12 are lexical near-dups (texts one
    // word apart; vectors orthogonal), 12 and 13 are semantic near-dups
    // (ε-leaked vectors; texts from disjoint vocabularies). The union
    // closure makes {11, 12, 13} ONE cluster → winner 11. Doc 20 is
    // unrelated on both signals → admits.
    addFile(flat, base, "f0", Seq(
      (12L, text("a", "zz"), vec(1)),
      (11L, text("a"), vec(0)),
      (13L, text("c"), vec(1, 2, 0.1f)),
      (20L, text("b"), vec(3))))
    // f1 — corpus drops through EITHER signal: doc 1's text copies the
    // ADMITTED 11 (vector brand new → lexical drop), doc 30's vector
    // paraphrases 11's (text brand new → semantic drop), doc 40 is new
    // on both → admits.
    addFile(flat, base, "f1", Seq(
      (1L, text("a", "yy"), vec(5)),
      (30L, text("d"), vec(0, 6, 0.1f)),
      (40L, text("e"), vec(7))))

    // pre-commit: an empty warehouse admits everything (mask width 0,
    // no index on disk — both probe paths must answer empty, not throw)
    val cold = MultiSignalIngest.wouldAdmit(spark, wh,
      Seq((9L, text("a"), vec(0))).toDF("query_id", "text", "embedding"))
      .collect()
    assert(cold.length == 1 && cold.head.getBoolean(1),
      "an un-committed warehouse must admit every candidate")

    // run 1: kill as soon as at least one batch admitted rows
    val q1 = Pipeline.runMultiSignalIngest(spark, flat, wh, ckpt)
    val survivorsDir = s"$wh/ms_survivors"
    val deadline = System.currentTimeMillis() + 120000
    def admitted(): Long =
      if (!Files.exists(java.nio.file.Paths.get(survivorsDir, "_SUCCESS"))) 0L
      else spark.read.parquet(survivorsDir).count()
    while (admitted() < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop()
    q1.awaitTermination(60000)
    val afterKill = admitted()
    assert(afterKill >= 1, "run 1 never admitted a row")

    // run 2: resume on the SAME checkpoint, drain to completion
    val q2 = Pipeline.runMultiSignalIngest(spark, flat, wh, ckpt)
    q2.awaitTermination(120000)

    val got = MultiSignalIngest.survivors(spark, wh)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 20L, 40L),
      s"survivors diverged (mixed chain split, or a signal missed): $got")

    // the lexical index holds exactly the survivors' band rows
    val idxDocs = MultiSignalIngest.index(spark, wh)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(idxDocs == got, s"lexical index out of sync: $idxDocs")

    // log: f0 = 4 in / 2 batch-dupes (12, 13 fell with the chain) /
    // 2 admitted; f1 = 3 in / 2 corpus-dupes (one per signal) / 1
    val log = MultiSignalIngest.ingestLog(spark, wh)
      .orderBy(col("batch_id"))
      .select(col("n_in"), col("n_batch_dupes"), col("n_corpus_dupes"),
        col("n_admitted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(log.toSeq == Seq((4L, 2L, 0L, 2L), (3L, 0L, 2L, 1L)),
      s"admission log diverged: ${log.toSeq}")

    assert(afterKill < 3,
      s"kill landed after the full drain ($afterKill survivors) — test proved nothing")

    // a drained checkpoint re-run is a no-op
    val q3 = Pipeline.runMultiSignalIngest(spark, flat, wh, ckpt)
    q3.awaitTermination(120000)
    assert(admitted() == 3L, "a drained checkpoint re-run must admit nothing")

    // serving pre-check over the drained corpus {11, 20, 40}: a lexical
    // copy of 11 is rejected with 11 as the lexical match, a paraphrase
    // vector of 11 is rejected semantically, a doc new on both signals
    // admits — and a query_id that COLLIDES with a survivor id (20)
    // must not cross-contaminate the shingle lookup
    val pre = MultiSignalIngest.wouldAdmit(spark, wh,
      Seq(
        (100L, text("a", "xx"), vec(8)),        // lexical dup of 11
        (200L, text("f"), vec(0, 9, 0.1f)),     // semantic dup of 11
        (20L, text("g"), vec(10)))              // new, id collides with survivor 20
        .toDF("query_id", "text", "embedding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(pre(100L) == ((false, 11L, -1L)),
      s"lexical pre-check diverged: ${pre(100L)}")
    assert(pre(200L) == ((false, -1L, 11L)),
      s"semantic pre-check diverged: ${pre(200L)}")
    assert(pre(20L) == ((true, -1L, -1L)),
      s"id-colliding new candidate must still admit: ${pre(20L)}")

    // the serving mask is sized from the LOG's running admission count
    // (no corpus scan per call) — pin that the log-derived corpus size
    // equals the survivors row count, i.e. the serving mask is exactly
    // the mask the worker's next batch would derive
    val fromLog = MultiSignalIngest.ingestLog(spark, wh)
      .agg(sum(col("n_admitted"))).head().getLong(0)
    val fromTable = MultiSignalIngest.survivors(spark, wh).count()
    assert(fromLog == fromTable,
      s"log-derived corpus size $fromLog != survivors count $fromTable — " +
        "the serving mask would diverge from the worker's")
  }
}
