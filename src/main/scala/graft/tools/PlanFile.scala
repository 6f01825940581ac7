package graft.tools

import graft.{Fixtures, Sessions, SparkEntry}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round evidence dumper: writes `explain("formatted")` for
  * each named query to `<outDir>/<query>_<tag>.txt` — the before/after
  * plan files the round's judge checks claims against.
  *
  * Usage: `runMain graft.tools.PlanFile <outDir> <tag> <query>...`
  * (env `SPARK_GRAFT_SF_DIR` picks the fixture dir, default sf0.1 —
  * the bench SF, so the dumped plan is the one the bench runs).
  */
object PlanFile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanFile <outDir> <tag> <query>...")
    val (outDir, tag, names) = (args(0), args(1), args.drop(2).toSeq)
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
    spark.sparkContext.setLogLevel("ERROR")
    Fixtures.ensureAll(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"),
        s"== $name ($tag, sf=$sfDir) ==\n$plan")
      println(s"[planfile] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
