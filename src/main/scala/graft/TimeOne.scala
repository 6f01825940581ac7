package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf iteration: same measurement
  * discipline as [[Bench]] (noop write, cache cleared between runs,
  * warmup at sf0.001), scoped to the queries named on the command line.
  */
object TimeOne {
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
    Fixtures.ensureAll(spark, sfDir)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeone] $name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
      // machine-readable twin of the line above — [[Bench]]'s isolated
      // re-timing pass parses these from the child process's stdout
      val ts = times.map(t =>
        "%.3f".formatLocal(java.util.Locale.ROOT, t)).mkString(",")
      println(s"""[timeone-json] {"name":"$name","min":${
        "%.3f".formatLocal(java.util.Locale.ROOT, times.min)},"times":[$ts]}""")
    }
    spark.stop()
  }
}
