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
    // GRAFT_JOB_COUNT=1: per-query scheduled-job/stage tally — the
    // denominator of the fixed-overhead analysis (a micro-batch gate's
    // cost is jobs × scheduling floor, not data)
    val jobCounter =
      if (!sys.env.contains("GRAFT_JOB_COUNT")) None
      else {
        val c = new org.apache.spark.scheduler.SparkListener {
          val jobs = new java.util.concurrent.atomic.AtomicLong
          val stages = new java.util.concurrent.atomic.AtomicLong
          val tasks = new java.util.concurrent.atomic.AtomicLong
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet()
            if (sys.env.get("GRAFT_JOB_COUNT").contains("2"))
              Console.err.println(s"[timeone-job] ${j.jobId} " +
                s"stages=${j.stageInfos.size} " +
                Option(j.properties)
                  .flatMap(p => Option(p.getProperty("spark.job.description")))
                  .getOrElse("").take(140))
            ()
          }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            stages.incrementAndGet()
            tasks.addAndGet(s.stageInfo.numTasks); ()
          }
        }
        spark.sparkContext.addSparkListener(c)
        Some(c)
      }
    // Warm ALL requested queries once at sf0.001 BEFORE any timing: in a
    // shared child JVM the first-timed query otherwise absorbs the whole
    // JIT bill for the code paths every later query reuses — measured
    // inverting the msb/ms gate comparison (the slowest-first ordering
    // put the bucketed gate first, and its "isolated" min carried ~3 s
    // of warmup the session number never sees). Failures surface in the
    // timed pass below, exactly like Bench's session warmup.
    for (name <- args) {
      // NonFatal only: an OOM/VM error in warmup leaves the JVM in an
      // undefined state — timing it anyway would ship garbage numbers
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.catalog.clearCache()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      def once(): Double = {
        jobCounter.foreach { c =>
          c.jobs.set(0); c.stages.set(0); c.tasks.set(0)
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        jobCounter.foreach { c =>
          // listener bus is async; give it a beat before reading
          Thread.sleep(300)
          Console.err.println(s"[timeone-jobs] $name jobs=${c.jobs.get} " +
            s"stages=${c.stages.get} tasks=${c.tasks.get}")
        }
        dt
      }
      // ADAPTIVE run count (the r11 verdict's bench-stability directive):
      // 3 runs, then keep running (to 8) while the 3 FASTEST still
      // disagree by >20% of their min — a fresh JVM's first runs are
      // JIT-dominated, and one extra warm run usually settles the
      // min-estimator that round-over-round comparison ranks by. The
      // cap sits at 8 (was 6): the streaming gates exercise enough
      // distinct code that 6 samples were measured still descending on
      // a cold box, and an unsettled min is exactly what the reliable
      // flag exists to prevent shipping.
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      times ++= (1 to 3).map(_ => once())
      def fast3 = times.sorted.take(3)
      while (times.length < 8 &&
          (fast3.max - fast3.min) / fast3.min > 0.20)
        times += once()
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
