package graft

import org.scalatest.funsuite.AnyFunSuite

/** The back half of the PCA pipeline that `emb_gramian` feeds: the
  * distributed pass reduces 100 TB of vectors to a d×d Gramian (2080
  * numbers at d=64), and the eigensolve then runs driver-side on that
  * tiny matrix — no distributed linear algebra needed. This spec runs
  * deterministic power iteration (with one deflation) on the query's
  * actual output and checks the eigenpair contract.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = 64

  /** Symmetric d×d matrix from the query's upper-triangle rows. */
  private lazy val gram: Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    SparkEntry.queries("emb_gramian")(spark, TestSpark.sf0001)
      .collect()
      .foreach { r =>
        val (i, j, g) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1, r.getDouble(2))
        m(i)(j) = g
        m(j)(i) = g
      }
    m
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)

  private def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)

  /** Power iteration from a fixed start, optionally deflating a known
    * eigenpair (fine here: the fixture spectrum is well-separated). */
  private def topEig(m: Array[Array[Double]],
      deflate: Option[(Double, Array[Double])]): (Double, Array[Double]) = {
    var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble) * (if (i % 2 == 0) 1 else -1))
    deflate.foreach { case (_, u) =>
      val c = v.zip(u).map { case (a, b) => a * b }.sum
      v = v.zip(u).map { case (a, b) => a - c * b }
    }
    for (_ <- 1 to 500) {
      var w = matVec(m, v)
      deflate.foreach { case (l, u) =>
        val c = w.zip(u).map { case (a, b) => a * b }.sum
        w = w.zip(u).map { case (a, b) => a - c * b }
      }
      val n = norm(w)
      v = w.map(_ / n)
    }
    val lambda = v.zip(matVec(m, v)).map { case (a, b) => a * b }.sum
    (lambda, v)
  }

  test("gramian is symmetric positive-semidefinite shaped (diag > 0, trace = sum of squares)") {
    for (i <- 0 until d) assert(gram(i)(i) > 0, s"diag $i")
    val trace = (0 until d).map(i => gram(i)(i)).sum
    assert(trace > 0)
    // Cauchy-Schwarz on every off-diagonal entry
    for (i <- 0 until d; j <- i + 1 until d)
      assert(gram(i)(j) * gram(i)(j) <= gram(i)(i) * gram(j)(j) * (1 + 1e-9),
        s"CS violated at ($i,$j)")
  }

  test("power iteration on the query output yields a genuine top eigenpair") {
    val (l1, u1) = topEig(gram, None)
    assert(l1 > 0)
    // residual ‖G·u − λu‖ relative to λ
    val res = norm(matVec(gram, u1).zip(u1).map { case (gv, uv) => gv - l1 * uv })
    assert(res / l1 < 1e-6, s"residual $res vs lambda $l1")
    // top eigenvalue dominates the average (trace/d) strictly
    val trace = (0 until d).map(i => gram(i)(i)).sum
    assert(l1 >= trace / d, s"l1 $l1 below average eigenvalue ${trace / d}")

    val (l2, u2) = topEig(gram, Some((l1, u1)))
    assert(l2 <= l1 * (1 + 1e-9), s"second eigenvalue $l2 above first $l1")
    val dot12 = u1.zip(u2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot12) < 1e-6, s"eigenvectors not orthogonal: $dot12")
  }
}
