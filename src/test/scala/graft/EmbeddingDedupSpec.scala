package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural contracts of the occupancy-scaled embedding near-dup
  * family beyond the oracle's value gate: cell width actually scales
  * with the corpus, multiprobe strictly widens single-probe, and no
  * pair is ever scored twice by the probe explosion. Runs at sf0.01
  * (the driver's gate SF). */
class EmbeddingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("multiprobe pairs are a strict superset of the single-probe pairs, each found once") {
    val single = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val multiRows = SparkEntry.queries("dedup_embedding_cosine_mp")(spark, sf)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val multi = multiRows.toSet
    // exactly one match per Hamming≤1 pair: the row list has no dupes
    assert(multiRows.length == multi.size,
      s"multiprobe scored a pair twice: ${multiRows.length} rows, ${multi.size} distinct")
    assert(single.toSet.subsetOf(multi),
      "a within-cell (Hamming-0) pair is missing from the multiprobe result")
    assert(multi.size > single.length,
      "multiprobe found nothing beyond the own-bucket pairs on a fixture where it must")
  }

  test("recall gate: found ⊆ truth invariants hold and multiprobe dominates single-probe") {
    val r = SparkEntry.queries("dedup_embedding_recall")(spark, sf).head()
    val (nTruth, nSingle, recSingle, nMulti, recMulti) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
    assert(nTruth > 0, "empty truth set — the gate can't measure")
    assert(nSingle <= nMulti && nMulti <= nTruth,
      s"containment chain broken: $nSingle / $nMulti / $nTruth")
    assert(recSingle == nSingle.toDouble / nTruth &&
      recMulti == nMulti.toDouble / nTruth)
    assert(recMulti > recSingle,
      s"Hamming-1 probing bought no recall: $recSingle vs $recMulti")
  }

  // Dominance alone would let a signature or mask regression crater
  // recall while every relative invariant still holds — these floors
  // are ABSOLUTE, set ~15% under the measured values (0.62 / 0.59 /
  // 0.31 on the 2026-08-13 fixtures), so a cratered candidate path
  // (wrong hyperplanes, over-wide mask, broken probe ring) fails the
  // suite rather than shipping as a silent recall cliff. recall_multi
  // is also the WORKER admit path's recall since the streaming gates
  // probe the same Hamming-1 ring.
  test("absolute recall floors: multiprobe holds its measured level at every gate SF") {
    def recMulti(d: String): Double =
      SparkEntry.queries("dedup_embedding_recall")(spark, d).head().getDouble(4)
    val atTiny = recMulti("/root/testdata/sf0.001")
    assert(atTiny >= 0.50, s"sf0.001 recall_multi cratered: $atTiny < 0.50")
    val atGate = recMulti(sf)
    assert(atGate >= 0.50, s"sf0.01 recall_multi cratered: $atGate < 0.50")
    val atWide = recMulti("/root/testdata/sf0.1")
    assert(atWide >= 0.25, s"sf0.1 recall_multi cratered: $atWide < 0.25")
  }

  test("cell width scales with corpus size: more vectors → more distinct cells, occupancy bounded") {
    def cellStats(d: String): (Long, Long) = {
      val cells = SparkEntry.queries("dedup_embedding_cosine")(spark, d)
      // derive the mask width from the pairs' cell values: cells are
      // sig & (2^b - 1), so max(cell) < 2^b and b grows with N
      val n = Tables.embeddings(spark, d).count()
      val maxCell = cells.agg(max(col("cell"))).head().getLong(0)
      (n, maxCell)
    }
    val (n1, max1) = cellStats("/root/testdata/sf0.001")
    val (n2, max2) = cellStats("/root/testdata/sf0.1")
    assert(n2 > n1, "fixture sizes did not differ; test is vacuous")
    // sf0.001 has 500 vectors → 4-bit mask (cells < 16); sf0.1 has
    // 2000 → 6-bit (cells < 64). The observed cells obey the widths.
    assert(max1 < 16, s"sf0.001 cell $max1 exceeds the 4-bit mask")
    assert(max2 < 64 && max2 >= 16,
      s"sf0.1 max cell $max2 not in the widened 6-bit range")
  }
}
