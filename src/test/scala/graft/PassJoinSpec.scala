package graft

import graft.operators.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** [[DedupOps.passJoinCandidates]] against brute-force truth: the
  * segment pigeonhole plus the |δ| + |Δl − δ| ≤ τ shift window must
  * yield a SUPERSET of every pair within the edit-distance threshold —
  * losslessness is the operator's whole contract (the registered
  * `er_fuzzy_passjoin` pins it against DuckDB's quadratic join on the
  * fixture; this spec pins it on adversarial lengths the fixture
  * doesn't have: empty strings, length-1 runts, pure inserts/deletes,
  * and both τ=1 and τ=2 geometries). */
class PassJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Textbook Wagner-Fischer, full matrix — the spec's independent
    * truth (the production path uses Spark's threshold levenshtein). */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(
        math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def strings(): IndexedSeq[String] = {
    val rnd = new scala.util.Random(42)
    val words = Vector("red", "blue", "ring", "bolt", "gear", "a", "bb", "")
    // short low-entropy strings: dense lev<=2 neighborhoods, degenerate
    // lengths (0..~14) that exercise zero-length segments
    (0 until 90).map { _ =>
      (0 until (1 + rnd.nextInt(3)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    }
  }

  for (tau <- Seq(1, 2))
    test(s"tau=$tau: candidates are a lossless superset of all lev<=$tau pairs") {
      import spark.implicits._
      val strs = strings()
      val df = strs.zipWithIndex
        .map { case (s, i) => (i.toLong, s) }.toDF("id", "str")
      val cand = DedupOps.passJoinCandidates(df, "id", "str", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      cand.foreach { case (a, b) =>
        assert(a < b, s"unordered or self pair ($a,$b)")
      }
      val truth = for {
        i <- strs.indices
        j <- (i + 1) until strs.size
        if lev(strs(i), strs(j)) <= tau
      } yield (i.toLong, j.toLong)
      assert(truth.nonEmpty, "degenerate fixture: no true pairs to miss")
      truth.foreach { p =>
        assert(cand.contains(p),
          s"MISSED $p: '${strs(p._1.toInt)}' vs '${strs(p._2.toInt)}' " +
            s"(lev=${lev(strs(p._1.toInt), strs(p._2.toInt))})")
      }
      // and the pigeonhole actually prunes: candidates stay well under
      // the all-pairs square (sanity that the equi-join is doing work)
      val allPairs = strs.size.toLong * (strs.size - 1) / 2
      assert(cand.size < allPairs,
        s"candidate set degenerated to all pairs ($allPairs)")
    }
}
