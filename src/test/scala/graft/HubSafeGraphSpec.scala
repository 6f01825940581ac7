package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hub posture of the graph family, exercised for real: a planted
  * hub-heavy graph runs with a slice size small enough to force
  * multi-slice adjacency AND a broadcast budget of zero to force the
  * shuffle-hash fallback — both regimes must be value-identical to the
  * default (single-slice, broadcast) plan, and the plans must actually
  * differ the way the size gate promises. */
class HubSafeGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Symmetric edge list of: hub 0 — {1..40}, plus triangles
    * (0,1,2), (0,3,4) via leaf-leaf edges 1–2 and 3–4, plus an
    * off-hub triangle (50,51,52). Hub degree 40 ≫ sliceK=8. */
  private def plantedEdges() = {
    val oneWay =
      (1L to 40L).map(i => (0L, i)) ++
        Seq((1L, 2L), (3L, 4L), (50L, 51L), (51L, 52L), (50L, 52L))
    val sym = oneWay ++ oneWay.map { case (a, b) => (b, a) }
    sym.toDF("src", "dst")
  }

  private val expectedTriangles = Map(
    0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    50L -> 1L, 51L -> 1L, 52L -> 1L)

  test("triangles: sliced + shuffle-fallback regime matches the broadcast regime and the planted truth") {
    val edges = plantedEdges()
    val default = GraphOps.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hubSafe = GraphOps.triangleCounts(edges, sliceK = 8, broadcastBudget = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(default == expectedTriangles)
    assert(hubSafe == expectedTriangles,
      "multi-slice + shuffle-hash fallback changed triangle counts")
  }

  test("triangles: the size gate actually flips the second lookup's join strategy") {
    val edges = plantedEdges()
    // only the plan ABOVE the cache boundary counts: the persisted
    // `oriented` relation prints its own upstream deg-orientation
    // broadcasts inside the InMemoryRelation dump, which are not part
    // of the lookup joins under test
    def planOf(budget: Long): String =
      GraphOps.triangleCounts(edges, sliceK = 8, broadcastBudget = budget)
        .queryExecution.executedPlan.toString
        .split("InMemoryRelation").head
    // generous budget → the adjacency second lookup broadcasts
    assert(planOf(Long.MaxValue).contains("BroadcastHashJoin"),
      "under budget: second lookup must broadcast")
    // zero budget → both lookups ride shuffle-hash with adj as build
    val fallback = planOf(0L)
    assert(!fallback.contains("BroadcastHashJoin"),
      "over budget: second lookup must NOT broadcast")
    assert("ShuffledHashJoin".r.findAllIn(fallback).size >= 2,
      "over budget: both adjacency lookups ride shuffle-hash joins")
  }

  test("edge jaccard: sliced + shuffle-fallback regime matches the broadcast regime") {
    val edges = plantedEdges()
    def run(sliceK: Int, budget: Long) =
      GraphOps.edgeJaccardTopK(edges, k = 5, sliceK = sliceK, broadcastBudget = budget)
        .select(col("node"), col("rnk"), col("similar_node"), col("common"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val default = run(GraphOps.AdjSliceK, GraphOps.BroadcastBudgetBytes)
    val hubSafe = run(3, 0L)
    assert(default == hubSafe,
      "multi-slice + shuffle-hash fallback changed jaccard rankings")
    // sanity on the planted truth: the off-hub triangle nodes see both
    // other corners with |N(u)∩N(v)| = 1 (the third corner)
    assert(default.exists { case (n, _, s, c) => n == 50L && s == 51L && c == 1L })
  }

  test("edge jaccard: an empty edge list returns an empty result, not an NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.edgeJaccardTopK(empty).count() == 0L)
  }

  test("hub adjacency really slices: ceil(deg/K) rows per node, full degree on every slice") {
    // the hub (deg 40, K=8) must cut into exactly 5 sequential slices of
    // 8, every row carrying the full degree; duplicated input pairs must
    // change nothing (the set aggregation dedups)
    val edges = plantedEdges()
    val rows = GraphOps.hubSafeAdjacency(edges.unionByName(edges), sliceK = 8)
    val hub = rows.filter(col("src") === 0L)
      .select(col("slice"), size(col("nbrs")), col("deg"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(hub.length == 5, s"deg-40 hub at K=8 must produce 5 slices, got ${hub.length}")
    assert(hub.forall(_._2 == 8), "sequential slices of a deg-40 hub are all 8 wide")
    assert(hub.forall(_._3 == 40L), "every slice must carry the full degree")
    assert(hub.map(_._1).sorted.toSeq == Seq(0, 1, 2, 3, 4))
    // leaves (deg ≤ K) stay single-slice — the registered queries' plans
    // are unchanged on any corpus whose max degree fits one slice
    val leaf = rows.filter(col("src") === 5L).collect()
    assert(leaf.length == 1 && leaf.head.getAs[Long]("deg") == 1L)
  }
}
