package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production fixpoint variants of the graph family — the round-4
  * verdict's "a real user running PageRank wants convergence, not 3
  * rounds". Both are tested on planted graphs where 3 fixed rounds
  * provably under-converge; the registered 3-round oracle contracts
  * are untouched. */
class GraphFixpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Symmetric path graph 0—1—2—3—4—5—6 (diameter 6). */
  private def pathEdges() = {
    val oneWay = (0L until 6L).map(i => (i, i + 1))
    (oneWay ++ oneWay.map { case (a, b) => (b, a) }).toDF("src", "dst")
  }

  test("bfsToFixpoint settles the whole diameter-6 path where 3 hops cannot") {
    val seeds = Seq(0L).toDF("node")
    val dist = GraphOps.bfsToFixpoint(pathEdges(), seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == (0L to 6L).map(i => i -> i).toMap,
      "hop distances on the path must equal node index")
    // the fixed 3-hop contract provably under-converges here: nodes 4..6
    // are beyond 3 hops, so a 3-round run cannot have settled them
    assert(dist.count(_._2 > 3L) == 3)
  }

  test("bfsToFixpoint: unreachable nodes stay absent, multi-seed takes the min layer") {
    val edges = pathEdges().unionByName(
      Seq((100L, 101L), (101L, 100L)).toDF("src", "dst"))
    val dist = GraphOps.bfsToFixpoint(edges, Seq(0L, 6L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds at both path ends: node 3 settles at depth 3, everything
    // else sooner; the disconnected 100—101 pair never appears
    assert(dist == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("pagerankToConvergence reaches a stationary point the 3-round contract hasn't") {
    val edges = pathEdges()
    val out = GraphOps.pagerankToConvergence(edges, tolMicro = 10L, maxRounds = 120)
    val rows = out.collect()
    val ranks = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rounds = rows.head.getInt(2)
    assert(rounds > 3 && rounds < 120,
      s"path-graph PageRank at tol=10 must need >3 rounds and converge ($rounds)")
    // stationarity: one more integer-exact round moves no rank by > tol
    val deg = Map(0L -> 1L, 6L -> 1L).withDefaultValue(2L)
    val adj = Map(
      0L -> Seq(1L), 6L -> Seq(5L)).withDefault(i => Seq(i - 1, i + 1))
    val contrib = ranks.toSeq.flatMap { case (n, r) =>
      adj(n).map(_ -> r / deg(n))
    }.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
    for ((n, r) <- ranks) {
      val next = 150000L + 85L * contrib.getOrElse(n, 0L) / 100L
      assert(math.abs(next - r) <= 10L,
        s"node $n not stationary: $r -> $next")
    }
    // the endpoints (degree 1) must rank differently from the interior
    // (degree 2) — a uniform answer would mean the iteration never ran
    assert(ranks(0L) != ranks(3L))
  }

  test("pagerankToConvergence: total rank mass stays near the damped-teleport invariant") {
    // Σrank ≈ n·150000 + 0.85·Σcontrib; on a symmetric graph with no
    // dangling mass the stationary total is n·1e6 up to integer-floor
    // loss per node (bounded by 100 micro each from the two divisions)
    val ranks = GraphOps.pagerankToConvergence(pathEdges(), tolMicro = 10L, maxRounds = 120)
      .collect().map(_.getLong(1))
    val n = ranks.length
    assert(math.abs(ranks.sum - n * 1000000L) <= n * 200L,
      s"total rank ${ranks.sum} drifted from ${n * 1000000L}")
  }
}
