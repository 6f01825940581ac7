package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-math guarantees behind `dedup_prefix_filter` (AllPairs): the
  * oracle proves zero misses on the fixture's distribution; these
  * properties prove the LEMMA on adversarial ones — tie-heavy df
  * orderings, tiny sets, identical sets, size-gate boundaries.
  *
  * Lemma (Bayardo et al., WWW'07, Jaccard form): order tokens by any
  * global total order; give each set x a prefix of its first
  * |x| − ⌈τ·|x|⌉ + 1 tokens. Then any pair with J(A,B) ≥ τ shares at
  * least one token lying in BOTH prefixes.
  */
class PrefixFilterSpec extends AnyFunSuite {

  private val Tau = 0.8

  /** Integer prefix length exactly as the query computes it:
    * sz − ((8·sz+9) div 10) + 1. */
  private def prefixLen(sz: Int): Int = sz - ((8 * sz + 9) / 10) + 1

  test("integer ceil identity: (8*sz+9) div 10 == ceil(0.8*sz) for all sizes") {
    for (sz <- 1 to 100000)
      assert((8 * sz + 9) / 10 == math.ceil(Tau * sz).toInt, s"sz=$sz")
  }

  test("property: every pair with J >= tau shares a token in both prefixes and passes the size gate") {
    val corpusGen: Gen[List[Set[Int]]] = for {
      nDocs <- Gen.chooseNum(2, 25)
      // small token universe forces heavy overlap and df ties
      docs <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.chooseNum(0, 14)).map(_.toSet))
    } yield docs

    val prop = Prop.forAll(corpusGen) { docs =>
      // global df over the corpus, order by (df asc, token asc) — the
      // query's exact ordering, ties and all
      val df = docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(x: Set[Int]): Set[Int] =
        x.toList.sortBy(t => (df(t), t)).take(prefixLen(x.size)).toSet

      val pairs = for {
        i <- docs.indices; j <- docs.indices if i < j
        a = docs(i); b = docs(j)
        inter = (a & b).size
        jac = inter.toDouble / (a | b).size
        if jac >= Tau
      } yield (a, b)

      pairs.forall { case (a, b) =>
        val sizeGate =
          math.min(a.size, b.size) * 10 >= math.max(a.size, b.size) * 8
        val shared = (prefix(a) & prefix(b)).nonEmpty
        sizeGate && shared
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("prefix never empty and identical sets always collide") {
    for (sz <- 1 to 2000) assert(prefixLen(sz) >= 1, s"sz=$sz")
    // J(A,A) = 1 ≥ τ: first-token membership guarantees the collision
    val a = Set(3, 1, 4, 1, 5, 9, 2, 6).map(identity)
    val df = a.map(_ -> 1).toMap
    val p = a.toList.sortBy(t => (df(t), t)).take(prefixLen(a.size)).toSet
    assert(p.nonEmpty && (p & p).nonEmpty)
  }
}
