package graft.operators

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.functions._
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
  *
  * PageRank runs THREE fixed unrolled rounds (same contract as the
  * dedup CC query: a fixed count the DuckDB twin replays exactly) in
  * LONG fixed-point micro-units: ranks start at 1e6, per-edge
  * contribution is `rank div outdeg`, damping is
  * `150000 + (85 * Σcontrib) div 100` — integer-only arithmetic, so the
  * result is order-independent and engine-exact (a double PageRank sums
  * in partition order and would differ run to run, let alone across
  * engines). Dangling mass is dropped (every node here has out-edges by
  * construction — the graph is symmetric).
  */
object GraphOps extends OpModule {

  def queries: Map[String, Q] = Map(
    // ── Fixed-point PageRank over the order co-occurrence graph. Each
    // round is one co-partitioned join + one groupBy on skinny
    // (node, contrib) rows — shuffle scales with the edge list. The edge
    // relation is persisted: the degree map and all three rounds consume
    // it, and eager materialization keeps the three-round chain from
    // serializing on the cache lock. ──
    "graph_pagerank" -> Q(
      (s, d) => {
        val a = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("src"))
        val b = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("dst"))
        val edges = a.join(b, Seq("l_orderkey"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        edges.count()
        val deg = edges.groupBy(col("src"))
          .agg(count(lit(1)).as("outdeg"))
        val withDeg = edges.join(deg, Seq("src"))
        val nodes = edges.select(col("src").as("node")).distinct()
        var ranks = nodes.withColumn("rank_micro", lit(1000000L))
        for (_ <- 1 to 3) {
          val contrib = withDeg
            .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
            .select(col("dst").as("node"),
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

    // ── Per-node triangle counts over the same co-occurrence graph.
    // Edges are oriented by DEGREE order (ties by id) before the wedge
    // join — the skew defense that makes distributed triangle counting
    // viable: every wedge pivots on the LOWEST-degree vertex of the
    // triangle, so a celebrity node of degree D contributes O(D)
    // wedge-side rows instead of O(D²). The triangle SET is orientation-
    // independent, so the DuckDB twin verifies with the simpler
    // id-orientation — same triangles, different join order: the compare
    // proves the optimization preserves semantics. All joins are
    // equi-joins on node keys; counts are integers. ──
    "graph_triangles" -> Q(
      (s, d) => {
        val a = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("src"))
        val b = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey").as("dst"))
        val sym = a.join(b, Seq("l_orderkey"))
          .filter(col("src") =!= col("dst"))
          .select(col("src"), col("dst"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK)
        sym.count()
        val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        // orient (u,v): keep the direction from the (deg, id)-smaller
        // endpoint — acyclic by totality of the order
        val oriented = sym
          .join(deg.toDF("src", "dsrc"), Seq("src"))
          .join(deg.toDF("dst", "ddst"), Seq("dst"))
          .filter(col("dsrc") < col("ddst") ||
            (col("dsrc") === col("ddst") && col("src") < col("dst")))
          .select(col("src"), col("dst"))
        val e1 = oriented.toDF("u", "v")
        val e2 = oriented.toDF("v", "w")
        val e3 = oriented.toDF("u", "w")
        val tri = e1.join(e2, Seq("v")).join(e3, Seq("u", "w"))
          .select(col("u"), col("v"), col("w"))
        tri.select(col("u").as("node"))
          .unionByName(tri.select(col("v").as("node")))
          .unionByName(tri.select(col("w").as("node")))
          .groupBy(col("node"))
          .agg(count(lit(1)).as("triangles"))
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
      doc = "Extension: per-node triangle counts (degree-ordered orientation vs id-ordered oracle)",
      sort = Seq("node")
    )
  )
}
