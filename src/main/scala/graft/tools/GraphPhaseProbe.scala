package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-level timing probe for the graph family's materialization
  * pipeline (optimization-round attribution tool — mirrors the phases
  * of GraphOps.triangleCounts / adaptiveAdjacency / edgeJaccardTopK so
  * each persist+count boundary gets its own wall-clock number).
  */
object GraphPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = LocalTool.sfDir
    val spark = LocalTool.session(sfDir)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm once at sf0.001 so JIT noise doesn't land on phase 1
    {
      val d = "/root/testdata/sf0.001"
      val a = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey").as("src"))
      val b = Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey").as("dst"))
      a.join(b, Seq("l_orderkey")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct().count()
    }

    for (round <- 1 to 2) {
      println(s"== round $round ==")
      val a = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey").as("src"))
      val b = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey").as("dst"))
      val rawPairs = a.join(b, Seq("l_orderkey"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))

      // --- adaptiveAdjacency phases (pagerank/edge_jaccard prefix) ---
      val raw = rawPairs.persist(StorageLevel.MEMORY_AND_DISK)
      t("adj: raw persist+probe") {
        raw.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .agg(coalesce(max(col("deg")), lit(0L)).as("m")).head.getLong(0)
      }
      val adj = graft.operators.GraphOps
        .hubSafeAdjacency(raw, graft.operators.GraphOps.AdjSliceK)
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("adj: hubSafe build+count")(adj.count())
      raw.unpersist(blocking = false)

      // the CHEAP probe alternative: per-(order,part) multiplicities
      t("adj: cheap probe (lineitem)") {
        val li = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        val pc = li.groupBy(col("o"), col("p")).agg(count(lit(1)).as("c"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o"))
        pc.withColumn("L", sum(col("c")).over(w))
          .select(col("p"), (col("c") * (col("L") - col("c"))).as("d"))
          .groupBy(col("p")).agg(sum(col("d")).as("deg"))
          .agg(coalesce(max(col("deg")), lit(0L))).head.getLong(0)
      }
      adj.unpersist(blocking = false)

      // --- triangleCounts phases ---
      val sym = rawPairs.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      t("tri: symEdges distinct")(sym.count())
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("tri: deg")(deg.count())
      val oriented = sym
        .join(broadcast(deg.toDF("src", "dsrc")), Seq("src"))
        .join(broadcast(deg.toDF("dst", "ddst")), Seq("dst"))
        .filter(col("dsrc") < col("ddst") ||
          (col("dsrc") === col("ddst") && col("src") < col("dst")))
        .select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("tri: oriented")(oriented.count())
      val adjT = oriented.groupBy(col("src"))
        .agg(collect_list(col("dst")).as("all"))
        .select(col("src"), explode(expr(
          "transform(sequence(0, (size(all)-1) div 4096)," +
            " i -> slice(all, i*4096+1, 4096))")).as("nbrs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("tri: adj build")(adjT.count())
      val perEdge = oriented
        .join(broadcast(adjT.select(col("src"), col("nbrs").as("nu"))), Seq("src"))
        .join(broadcast(adjT.select(col("src").as("dst"), col("nbrs").as("nw"))),
          Seq("dst"))
        .select(col("src").as("u"), col("dst").as("v"),
          array_intersect(col("nu"), col("nw")).as("ws"))
      t("tri: intersect+agg") {
        perEdge
          .select(explode(flatten(transform(col("ws"), w =>
            array(struct(col("u").as("node"), lit(1L).as("c")),
              struct(col("v").as("node"), lit(1L).as("c")),
              struct(w.as("node"), lit(1L).as("c")))))).as("tc"))
          .groupBy(col("tc.node").as("node"))
          .agg(sum(col("tc.c")).as("triangles"))
          .write.format("noop").mode("overwrite").save()
      }
      sym.unpersist(); deg.unpersist(); oriented.unpersist(); adjT.unpersist()

      // --- alternative edge derivation: per-order sets ---
      t("alt: order-set pairs distinct") {
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("ps"))
          .select(explode(col("ps")).as("src"), col("ps"))
          .select(col("src"), explode(col("ps")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct().count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
