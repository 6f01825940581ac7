package graft.tools

import graft.plans.SimilarityJoin
import graft.{Sessions, Tables}
import org.apache.spark.HashPartitioner
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Phase-attribution probe for the native [[SimilarityJoin]] operator:
  * rebuilds the exec's RDD pipeline phase by phase (same helpers, same
  * hash family) and times each materialization separately, because the
  * operator's stages hide inside one doExecute and the stage timer
  * can't see them. Run with SPARK_GRAFT_SF_DIR pointing at the corpus:
  *
  *   graft.tools.NativeJoinProbe
  *
  * Prints [njp] lines: shingle+persist, band-signature+bucket+pairs,
  * pair distinct, verify join. The phases sum to within noise of the
  * registered `dedup_minhash_native` wall time. */
object NativeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[njp] $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val (n, nh, br, th) = (3, 32, 4, 0.8)
    val numBands = nh / br
    for (round <- 1 to 2) {
      println(s"[njp] -- round $round --")
      val rows = Tables.documents(spark, sfDir)
        .select("doc_id", "text").na.fill("", Seq("text"))
      val docs = rows.rdd
        .map(r => (r.getLong(0),
          SimilarityJoin.shingles(
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)), n)))
        .partitionBy(new HashPartitioner(spark.sparkContext.defaultParallelism))
        .persist(StorageLevel.MEMORY_AND_DISK)
      t("shingle+persist")(docs.count())

      val pairsRaw = docs
        .flatMap { case (id, sh) =>
          if (sh.isEmpty) Iterator.empty
          else {
            val mh = SimilarityJoin.minhashes(sh, nh)
            (0 until numBands).iterator.map { b =>
              ((b, (b * br until (b + 1) * br).map(mh).mkString(",")), id)
            }
          }
        }
        .aggregateByKey(List.empty[Long])((l, id) => id :: l, _ ::: _)
        .flatMap { case (_, ids) =>
          val s = ids.sorted.toArray
          for {
            i <- s.indices.iterator
            j <- (i + 1 until s.length).iterator
          } yield (s(i), s(j))
        }
      val pairs = pairsRaw.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      t("bands+buckets")(pairs.count())

      val out = pairs
        .join(docs)
        .map { case (a, (b, shA)) => (b, (a, shA)) }
        .join(docs)
        .flatMap { case (b, ((a, shA), shB)) =>
          val (small, large) =
            if (shA.length <= shB.length) (shA, shB) else (shB, shA)
          val set = new java.util.HashSet[String](small.length * 2)
          var i = 0
          while (i < small.length) { set.add(small(i)); i += 1 }
          var inter = 0
          i = 0
          while (i < large.length) {
            if (set.contains(large(i))) inter += 1
            i += 1
          }
          val j = inter.toDouble / (shA.length + shB.length - inter).toDouble
          if (j >= th) Iterator((a, b, j)) else Iterator.empty
        }
      t("verify")(out.count())
      docs.unpersist(); pairs.unpersist()
    }
    spark.stop()
  }
}
