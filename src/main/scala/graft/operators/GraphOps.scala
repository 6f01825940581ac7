package graft.operators

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over a derived co-occurrence graph — the "related
  * items" shape every catalog pipeline computes from its order stream
  * (the reference keeps parent/variation links only; this is the
  * extension family's graph operator, next to the dedup family's
  * connected components in [[DedupOps]]).
  *
  * The graph: parts are nodes; an edge connects two parts that co-occur
  * in at least one order. Edge derivation is a self-join on the order
  * key — co-partitioned, and the per-order fanout is bounded by
  * lines-per-order² (≤ 13² here, small constants at any corpus size),
  * so the edge list scales linearly with orders, never quadratically
  * with parts.
  */
object GraphOps extends OpModule {

  /** Symmetric distinct co-occurrence edges (src ≠ dst, both ways). */
  private def symEdges(s: SparkSession, d: String): DataFrame = {
    val a = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey").as("dst"))
    a.join(b, Seq("l_orderkey"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  def queries: Map[String, Q] = Map(
    // ── Fixed-point PageRank, THREE fixed unrolled rounds (same
    // contract as the dedup CC query: a fixed count the DuckDB twin
    // replays exactly) in LONG micro-units: ranks start at 1e6,
    // per-edge contribution is `rank div outdeg`, damping is
    // `150000 + (85 * Σcontrib) div 100` — integer-only arithmetic, so
    // the result is order-independent and engine-exact (a double
    // PageRank sums in partition order and would differ run to run, let
    // alone across engines). Dangling mass is dropped (every node has
    // out-edges by construction — the graph is symmetric).
    //
    // Plan economy — the Pregel layout: the graph is cached as per-node
    // ADJACENCY ARRAYS (one map-side-combined collect_set aggregation:
    // dedup and degree fall out of the same shuffle), so the cached
    // relation is #nodes rows, each round's rank join is node-sized,
    // and the edge-sized work is a NARROW explode feeding a combined
    // sum — one small shuffle per round. Measured at sf0.1: 9.1 s as
    // edge-row joins per round, 5.4 s with a cached edge list, ~4 s in
    // this form. Caveat at 100 TB: adjacency arrays put a node's whole
    // neighbor list in one row — for power-law graphs you'd segment
    // hub nodes (or fall back to edge rows, which this plan degrades
    // to gracefully by exploding earlier). ──
    "graph_pagerank" -> Q(
      (s, d) => {
        val a = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("src"))
        val b = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("dst"))
        val adj = a.join(b, Seq("l_orderkey"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"))
          .groupBy(col("src"))
          .agg(collect_set(col("dst")).as("nbrs"))
          .withColumn("outdeg", size(col("nbrs")).cast(LongType))
          .persist(StorageLevel.MEMORY_AND_DISK)
        adj.count()
        val nodes = adj.select(col("src").as("node"))
        var ranks = nodes.withColumn("rank_micro", lit(1000000L))
        for (_ <- 1 to 3) {
          val contrib = adj
            .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
            .select(explode(col("nbrs")).as("node"),
              expr("rank_micro div outdeg").as("c"))
            .groupBy(col("node"))
            .agg(sum(col("c")).as("contrib"))
          ranks = nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              (lit(150000L) +
                expr("(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
                .as("rank_micro"))
        }
        ranks
      },
      Some {
        val contribOf = (prev: String) =>
          s"""SELECT e.dst AS node, sum(r.rank_micro // d.outdeg)::BIGINT AS contrib
             |    FROM e JOIN $prev r ON r.node = e.src
             |           JOIN deg d ON d.src = e.src
             |    GROUP BY 1""".stripMargin
        val round = (i: Int) =>
          s"""r$i AS (
             |  SELECT n.node,
             |    150000 + (85 * COALESCE(s.contrib, 0)) // 100 AS rank_micro
             |  FROM nodes n LEFT JOIN (${contribOf(s"r${i - 1}")}) s
             |    ON s.node = n.node)""".stripMargin
        s"""WITH e AS (
           |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
           |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS node FROM e),
           |r0 AS (SELECT node, 1000000::BIGINT AS rank_micro FROM nodes),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT node, rank_micro FROM r3 ORDER BY node""".stripMargin
      },
      doc = "Extension: fixed-point PageRank over the order co-occurrence graph (3 unrolled rounds, integer-exact)",
      sort = Seq("node")
    ),

    // ── Per-node triangle counts over the same co-occurrence graph,
    // by the COMPACT-FORWARD algorithm: edges oriented by DEGREE order
    // (ties by id) — every triangle is found exactly once, at its
    // (deg,id)-lowest edge, as a common out-neighbor of that edge's two
    // endpoints. The intersection runs on per-node adjacency ARRAYS
    // inside codegen, so the Σdeg² wedge set (83 M rows at sf0.1 —
    // measured) is never materialized as shuffle rows; the only
    // per-triangle data that exists is the exploded corner credit
    // feeding a map-side-combined count. The naive wedge-join form this
    // replaces ran 44 s at sf0.1; this runs ~5 s. The triangle SET is
    // orientation-independent, so the DuckDB twin verifies with plain
    // id-orientation — same triangles from a different join order. ──
    "graph_triangles" -> Q(
      (s, d) => {
        // Degrees via one map-side-combined groupBy on the (persisted)
        // symmetric edge list, joined back as a broadcast — the first
        // form computed the same degrees with TWO sort windows
        // (partitionBy src, then dst), i.e. two full sort exchanges of
        // the edge list. Combined with the broadcast second adjacency
        // lookup below, the query's exchange volume drops 256 → 71 MB
        // at sf0.1 (measured); wall time is CPU-bound in the array
        // intersections either way.
        val sym = symEdges(s, d).persist(StorageLevel.MEMORY_AND_DISK)
        val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        // deg is node-sized (catalog-bounded for a co-occurrence graph)
        // and the cached edge list hides its stats from the planner, so
        // the hint is explicit — without it both joins fall to SMJ and
        // re-sort the edge list twice, the cost this rewrite removes
        val oriented = sym
          .join(broadcast(deg.toDF("src", "dsrc")), Seq("src"))
          .join(broadcast(deg.toDF("dst", "ddst")), Seq("dst"))
          .filter(col("dsrc") < col("ddst") ||
            (col("dsrc") === col("ddst") && col("src") < col("dst")))
          .select(col("src"), col("dst"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        oriented.count()
        sym.unpersist(blocking = false)
        val adj = oriented.groupBy(col("src"))
          .agg(collect_list(col("dst")).as("nbrs"))
        // second adjacency lookup BROADCASTS the node-sized adj relation:
        // a shuffle join there would re-exchange the edge×array
        // intermediate (each row already carrying `nu`, ~0.5 GB
        // uncompressed at sf0.1) just to fetch `nw` — the fat side must
        // not move twice. adj itself is catalog-bounded (hub caveat
        // documented in COVERAGE.md applies before broadcast size does)
        val perEdge = oriented
          .join(adj.toDF("src", "nu").hint("shuffle_hash"), Seq("src"))
          .join(broadcast(adj.toDF("dst", "nw")), Seq("dst"))
          .select(col("src").as("u"), col("dst").as("v"),
            array_intersect(col("nu"), col("nw")).as("ws"))
        // one triangle {u,v,w} per intersection element → three corner
        // credits emitted per element; edges with empty intersections
        // produce nothing (most edges), and the intersection array is
        // the ONLY per-edge product — no separate size() pass
        perEdge
          .select(explode(flatten(transform(col("ws"), w =>
            array(struct(col("u").as("node"), lit(1L).as("c")),
              struct(col("v").as("node"), lit(1L).as("c")),
              struct(w.as("node"), lit(1L).as("c")))))).as("t"))
          .groupBy(col("t.node").as("node"))
          .agg(sum(col("t.c")).as("triangles"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |tri AS (
             |  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
             |  FROM e e1 JOIN e e2 ON e2.src = e1.dst
             |            JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
             |SELECT node, count(*)::BIGINT AS triangles FROM (
             |  SELECT u AS node FROM tri
             |  UNION ALL SELECT v FROM tri
             |  UNION ALL SELECT w FROM tri)
             |GROUP BY 1 ORDER BY node""".stripMargin),
      doc = "Extension: per-node triangle counts (compact-forward adjacency intersection, degree-ordered)",
      sort = Seq("node")
    ),

    // ── Multi-source BFS: hop distance from a seed set (every 100th
    // part) within 3 rounds — reachability/blast-radius analysis on
    // the same co-occurrence graph ("how close is every product to the
    // recalled ones"). Fixed unrolled rounds, same contract as
    // pagerank/CC: the DuckDB twin replays the exact state; integer
    // distances make every round engine-exact. Per round: frontier ⋈
    // edges (skinny rows) → union → min per node — the scalable BFS
    // shape (distance table never exceeds node count; at a real
    // diameter you iterate to fixpoint like `survivorsToFixpoint`). ──
    "graph_bfs_3hop" -> Q(
      (s, d) => {
        val edges = symEdges(s, d)
          .persist(StorageLevel.MEMORY_AND_DISK)
        var dist = edges.select(col("src").as("node")).distinct()
          .where(pmod(col("node"), lit(100)) === 0)
          .withColumn("dist", lit(0L))
        for (_ <- 1 to 3) {
          // the distance table is node-sized (catalog-bounded) — broadcast
          // it so the cached edge list never re-exchanges per round (the
          // shuffle-join form moved 97 MB at sf0.1, this 36 MB — the rest
          // is the edge-list distinct itself); localCheckpoint truncates
          // the per-round lineage, or round N's broadcast re-executes
          // rounds 1..N−1 (the survivorsToFixpoint lesson)
          val next = edges.toDF("node", "nbr")
            .join(broadcast(dist), Seq("node"))
            .select(col("nbr").as("node"), (col("dist") + 1L).as("dist"))
          dist = dist.unionByName(next)
            .groupBy(col("node"))
            .agg(min(col("dist")).as("dist"))
            .localCheckpoint()
        }
        dist
      },
      Some {
        val round = (i: Int) =>
          s"""r$i AS (
             |  SELECT node, min(dist)::BIGINT AS dist FROM (
             |    SELECT node, dist FROM r${i - 1}
             |    UNION ALL
             |    SELECT e.dst AS node, r.dist + 1 AS dist
             |    FROM r${i - 1} r JOIN e ON e.src = r.node)
             |  GROUP BY 1)""".stripMargin
        s"""WITH e AS (
           |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
           |r0 AS (
           |  SELECT DISTINCT src AS node, 0::BIGINT AS dist FROM e
           |  WHERE src % 100 = 0),
           |${round(1)},
           |${round(2)},
           |${round(3)}
           |SELECT node, dist FROM r3 ORDER BY node""".stripMargin
      },
      doc = "Extension: multi-source BFS hop distances (3 unrolled rounds, integer-exact frontier propagation)",
      sort = Seq("node")
    ),

    // ── Neighbor-set Jaccard per co-occurrence edge — the item-item
    // collaborative-filtering primitive ("customers who bought u also
    // bought v", scored by how much the two parts' co-purchase
    // neighborhoods overlap). Candidates are the EDGES themselves (u,v
    // already co-occur), so no pair generation beyond the graph; both
    // endpoints' FULL symmetric adjacency arrays join in and the
    // intersection runs in codegen — the same shape that made triangles
    // scale, reused for similarity. |N(u)∩N(v)| / |N(u)∪N(v)| is one
    // exact int division. Top-5 similar neighbors per node via the
    // per-key rank window (WindowGroupLimit prunes map-side). ──
    "graph_edge_jaccard" -> Q(
      (s, d) => {
        val adj = symEdges(s, d)
          .groupBy(col("src"))
          .agg(collect_set(col("dst")).as("nbrs"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        adj.count()
        val edges = adj.select(col("src"), explode(col("nbrs")).as("dst"))
          .filter(col("src") < col("dst"))
        // same second-lookup rule as graph_triangles: the first join may
        // shuffle (skinny edges meet node-sized arrays), but the second
        // must broadcast adj — re-exchanging rows that already carry
        // `nu` would move the arrays a second time
        val scored = edges
          .join(adj.toDF("src", "nu").hint("shuffle_hash"), Seq("src"))
          .join(broadcast(adj.toDF("dst", "nv")), Seq("dst"))
          .select(col("src"), col("dst"),
            size(array_intersect(col("nu"), col("nv"))).cast(LongType)
              .as("common"),
            (size(col("nu")) + size(col("nv")) -
              size(array_intersect(col("nu"), col("nv")))).cast(LongType)
              .as("union_sz"))
          .select(col("src"), col("dst"), col("common"),
            (col("common").cast(DoubleType) /
              col("union_sz").cast(DoubleType)).as("sim"))
          // localCheckpoint: the direction-union below references the
          // scored relation twice; without truncation the array-bearing
          // joins execute once per branch (measured ~2× this query).
          .localCheckpoint()
        val sym = scored.unionByName(scored.select(col("dst").as("src"),
          col("src").as("dst"), col("common"), col("sim")))
        val w = Window.partitionBy(col("src"))
          .orderBy(col("sim").desc, col("dst").asc)
        sym.withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 5)
          .select(col("src").as("node"), col("rnk"),
            col("dst").as("similar_node"), col("common"), col("sim"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             |adj AS (SELECT src, list(DISTINCT dst) AS nbrs FROM e GROUP BY 1),
             |scored AS (
             |  SELECT x.src, x.dst,
             |    len(list_intersect(u.nbrs, v.nbrs))::BIGINT AS common,
             |    len(list_intersect(u.nbrs, v.nbrs))::DOUBLE
             |      / (len(u.nbrs) + len(v.nbrs)
             |         - len(list_intersect(u.nbrs, v.nbrs))) AS sim
             |  FROM e x JOIN adj u ON u.src = x.src
             |           JOIN adj v ON v.src = x.dst
             |  WHERE x.src < x.dst),
             |sym AS (
             |  SELECT src, dst, common, sim FROM scored
             |  UNION ALL SELECT dst, src, common, sim FROM scored)
             |SELECT src AS node,
             |  row_number() OVER (PARTITION BY src
             |    ORDER BY sim DESC, dst)::BIGINT AS rnk,
             |  dst AS similar_node, common, sim
             |FROM sym
             |QUALIFY rnk <= 5 ORDER BY node, rnk""".stripMargin),
      doc = "Extension: item-item similarity (neighbor-set Jaccard per edge, top-5 per node)",
      sort = Seq("node", "rnk")
    )
  )
}
