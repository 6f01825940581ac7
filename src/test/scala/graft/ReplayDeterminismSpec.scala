package graft

import graft.operators.DedupOps
import graft.streaming.{EmbedIngest, MultiSignalIngest}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Replay determinism under CROSS-BATCH KEY RE-USE — the exactly-once
  * contract the kill/resume specs advertise, driven at the one crash
  * point they cannot reach from outside: between the survivors upsert
  * and the checkpoint commit. `processBatch` is the foreachBatch body;
  * a crash in that window re-invokes it with the SAME batch id, so the
  * scenario is: run the batch once (state fully written), then run it
  * again, and demand the warehouse is bit-identical to a never-crashed
  * run.
  *
  * The load-bearing fixture: batch 1 RE-DELIVERS a key batch 0 already
  * admitted. The keyed upsert bumps that row's `batch_id` (content is
  * last-write-wins), so a `batch_id < batchId` prior-filter would lose
  * the survivor on replay — shrinking the corpus count by one, and the
  * fixture pins that count at the 2^0·CellOcc occupancy boundary
  * (30 prior + 3 arrivals = 33 → 1-bit mask; a lost survivor reads 32
  * → 0-bit mask), where the whole batch's candidate generation
  * changes: the batch carries a near-dup pair engineered to sit in
  * DIFFERENT 1-bit cells (admitted separately) that one 0-bit cell
  * would cluster (one admitted). The immutable `first_admitted_batch`
  * column is what keeps the replay's corpus count — and so the mask,
  * the candidates, and the log — identical. */
class ReplayDeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Unit vector along `i` with an `eps` leak onto `j` (the family's
    * spec construction): leaked copies sit at cos = 1/√(1+eps²) ≥ 0.4
    * for eps ≤ 2; distinct axes are orthogonal. */
  private def vec(i: Int, j: Int = -1, eps: Float = 0f): Seq[Float] =
    Seq.tabulate(64)(d => if (d == i) 1f else if (d == j) eps else 0f)

  /** A cosine-near-dup pair (cos ≥ 0.4) whose hyperplane signatures
    * DIFFER in bit 0, found by deterministic search over leak axes —
    * under a 1-bit mask the two land in different cells (no edge);
    * under a 0-bit mask they share the one cell (edge, cluster). The
    * hyperplanes are fixed, so the search result is stable. */
  private lazy val splitPair: (Seq[Float], Seq[Float]) = {
    val base = vec(31)
    val cands = (for (j <- 32 until 64; eps <- Seq(0.5f, 1f, 1.5f, 2f))
      yield vec(31, j, eps)).toList
    val sigs = DedupOps.embeddingSigged(
        (base :: cands).zipWithIndex
          .map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding"))
      .select(col("vec_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bit0 = sigs(0L) & 1L
    val hit = cands.indices.find(i => (sigs(i + 1L) & 1L) != bit0)
      .getOrElse(fail("no leak axis flips signature bit 0 — fixture broken"))
    (base, cands(hit))
  }

  // the boundary the fixture pins: one lost prior survivor flips the mask
  test("fixture sits on the occupancy-mask boundary") {
    assert(DedupOps.cellMaskFor(33) == 1L && DedupOps.cellMaskFor(32) == 0L)
  }

  test("EmbedIngest: crash between upsert and checkpoint with a re-delivered admitted key — replay restates identical state") {
    val (y1, y2) = splitPair
    val b0 = (0 until 30).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    // re-delivers admitted key 0, plus the engineered split pair
    val b1 = Seq((0L, vec(0)), (101L, y1), (102L, y2))
      .toDF("vec_id", "embedding")

    def state(wh: String) = (
      EmbedIngest.survivors(spark, wh)
        .select(col("vec_id"), col("batch_id"), col("first_admitted_batch"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      EmbedIngest.ingestLog(spark, wh).orderBy(col("batch_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq)

    val whClean = Files.createTempDirectory("graft-replay-em-clean").toString
    EmbedIngest.processBatch(b0, 0, whClean)
    EmbedIngest.processBatch(b1, 1, whClean)

    val whCrash = Files.createTempDirectory("graft-replay-em-crash").toString
    EmbedIngest.processBatch(b0, 0, whCrash)
    EmbedIngest.processBatch(b1, 1, whCrash) // attempt: state written in full…
    EmbedIngest.processBatch(b1, 1, whCrash) // …checkpoint never committed: replay

    assert(state(whCrash) == state(whClean),
      s"replay diverged from the never-crashed run:\n${state(whCrash)}\nvs\n${state(whClean)}")

    val (surv, log) = state(whClean)
    // the 1-bit mask admits the split pair as TWO survivors — the
    // outcome a mask collapse would change
    assert(surv.map(_._1).intersect(Set(101L, 102L)) == Set(101L, 102L),
      s"split pair not admitted separately under the 1-bit mask: $surv")
    // the re-delivered key updated (batch_id bumped) but its admission
    // batch is immutable
    assert(surv.contains((0L, 1L, 0L)),
      s"re-delivered key lost its immutable first_admitted_batch: $surv")
    // b1: 3 in, 0 batch dupes, the re-delivery books as the one
    // corpus dupe (an update, not a new admission), 2 first admissions
    assert(log == Seq((0L, 30L, 0L, 0L, 30L), (1L, 3L, 0L, 1L, 2L)),
      s"admission log diverged: $log")
  }

  test("MultiSignalIngest: crash between upsert and checkpoint with a re-delivered admitted key — replay restates identical state") {
    val (y1, y2) = splitPair
    def tx(i: Long): String =
      (1 to 10).map(k => s"w${i}x$k").mkString(" ") // disjoint vocabularies
    val b0 = (0 until 30).map(i => (i.toLong, tx(i), vec(i)))
      .toDF("doc_id", "text", "embedding")
    val b1 = Seq((0L, tx(0), vec(0)), (101L, tx(101), y1), (102L, tx(102), y2))
      .toDF("doc_id", "text", "embedding")

    def state(wh: String) = (
      MultiSignalIngest.survivors(spark, wh)
        .select(col("doc_id"), col("batch_id"), col("first_admitted_batch"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      MultiSignalIngest.index(spark, wh)
        .select(col("doc_id"), col("band"), col("sig"), col("batch_id"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getLong(3))).toSet,
      MultiSignalIngest.ingestLog(spark, wh).orderBy(col("batch_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq)

    val whClean = Files.createTempDirectory("graft-replay-ms-clean").toString
    MultiSignalIngest.processBatch(b0, 0, whClean)
    MultiSignalIngest.processBatch(b1, 1, whClean)

    val whCrash = Files.createTempDirectory("graft-replay-ms-crash").toString
    MultiSignalIngest.processBatch(b0, 0, whCrash)
    MultiSignalIngest.processBatch(b1, 1, whCrash) // attempt: state written…
    MultiSignalIngest.processBatch(b1, 1, whCrash) // …not committed: replay

    assert(state(whCrash) == state(whClean),
      s"replay diverged from the never-crashed run")

    val (surv, _, log) = state(whClean)
    assert(surv.map(_._1).intersect(Set(101L, 102L)) == Set(101L, 102L),
      s"split pair not admitted separately under the 1-bit mask: $surv")
    assert(surv.contains((0L, 1L, 0L)),
      s"re-delivered key lost its immutable first_admitted_batch: $surv")
    assert(log == Seq((0L, 30L, 0L, 0L, 30L), (1L, 3L, 0L, 1L, 2L)),
      s"admission log diverged: $log")
  }
}
