package graft

import graft.operators.HllExact
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** The sketch hash's three implementations must agree and the
  * permutation must actually mix: [[HllExact.hash60]] (the Column form
  * the engine runs) against [[HllExact.hash60Long]] (an independent
  * plain-JVM computation of the same rounds) across the full signed
  * key domain, plus an avalanche property — the statistical contract
  * the HLL register distribution rests on. The SQL twin is pinned
  * transitively: the oracle gate compares the Column form's registers
  * against DuckDB's replay on every verify run. */
class Hash60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Column form == client twin on random, extreme, and negative keys") {
    val rng = new scala.util.Random(42)
    val keys = (Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue + 1,
      (1L << 60) - 1, 1L << 60, -(1L << 60)) ++
      Seq.fill(500)(rng.nextLong()).filter(_ != Long.MinValue)).distinct
    val got = keys.toDF("k")
      .select(col("k"), HllExact.hash60(col("k").cast(LongType)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- keys)
      assert(got(k) == HllExact.hash60Long(k),
        s"Column/JVM divergence: key=$k got=${got(k)} want=${HllExact.hash60Long(k)}")
  }

  test("outputs stay in [0, 2^60) — the register math's domain contract") {
    val keys = (-1000L to 1000L) ++ Seq(Long.MaxValue, Long.MinValue + 1)
    for (k <- keys) {
      val h = HllExact.hash60Long(k)
      assert(h >= 0L && h < (1L << 60), s"key=$k out of domain: $h")
    }
  }

  test("avalanche: flipping one input bit flips ~half the output bits") {
    // mean flipped-bit count over many (key, bit) pairs must sit near
    // 30 of 60 — a structural failure (the affine-family bug this hash
    // replaced) shows up as a mean far off 30
    val rng = new scala.util.Random(42)
    val samples = for (_ <- 1 to 2000) yield {
      val k = rng.nextLong() & ((1L << 60) - 1)
      val bit = rng.nextInt(60)
      java.lang.Long.bitCount(
        HllExact.hash60Long(k) ^ HllExact.hash60Long(k ^ (1L << bit)))
    }
    val mean = samples.sum.toDouble / samples.size
    assert(math.abs(mean - 30.0) < 3.0,
      f"avalanche mean $mean%.2f strayed from 30 — the hash is not mixing")
  }
}
