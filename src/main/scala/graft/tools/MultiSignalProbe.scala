package graft.tools

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposes `dedup_multi_signal`'s cost: edge-set sizes, fixpoint
  * round count (the `rounds` column the registered query drops), and
  * wall per stage — the measurement that decides whether the CC loop
  * needs a log-round variant or the edge generators dominate. */
object MultiSignalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Fixtures.ensureAll(spark, sfDir)

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[msig] $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // warm
    SparkEntry.queries("dedup_multi_signal")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    // the registered query drops `rounds`; reach it via the module's
    // private helper replay: recompute with the public pieces
    val full = t("full-query") {
      val df = SparkEntry.queries("dedup_multi_signal")(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      df
    }
    spark.catalog.clearCache()
    // decompose: lexical-only survivors (same minhash edge pipeline)
    t("lexical-3round") {
      SparkEntry.queries("dedup_survivors")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    t("semantic-pairs") {
      SparkEntry.queries("dedup_embedding_cosine")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    val labelsDf = t("labels-helper") {
      val df = graft.operators.DedupOps.multiSignalLabels(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      df
    }
    val rounds = labelsDf.select(col("rounds")).head().getInt(0)
    println(s"[msig] fixpoint-rounds=$rounds")
    spark.catalog.clearCache()
    // cluster structure of the full result
    val stats = full.agg(
      count(lit(1)).as("docs"),
      countDistinct(col("cluster_id")).as("clusters"),
      sum(when(col("is_survivor"), 0L).otherwise(1L)).as("dupes")).head()
    println(s"[msig] docs=${stats.getLong(0)} clusters=${stats.getLong(1)} " +
      s"dupes=${stats.getLong(2)}")
    spark.stop()
  }
}
