package graft.tools

import graft.Sessions
import graft.sinks.UpsertWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Measures the write-path scaling claim behind the workers'
  * `stateBuckets` forms: sequential INSERT-ONLY batches of equal size
  * land in a growing keyed table through each of the three write
  * shapes, and the per-batch write wall is recorded —
  *
  *  - `plain`:   [[UpsertWriter.upsert]] — whole-table rewrite per
  *               batch; cost must TRACK THE CORPUS (the O(corpus)
  *               write the r10 verdict flagged);
  *  - `merge`:   [[UpsertWriter.upsertBucketed]] — touched-bucket
  *               rewrite; with fresh uniformly-hashed keys every
  *               bucket is touched once batch keys ≥ buckets, so cost
  *               also tracks the corpus (the merge is the UPDATE form,
  *               not the ingest form);
  *  - `append`:  [[UpsertWriter.appendBucketed]] — delta files only;
  *               cost must stay ≈ FLAT as the corpus grows (the
  *               O(batch) ingest form the workers' pure-insert
  *               branches ride).
  *
  * Rows come from the fixture lineitem (key = l_orderkey·10 +
  * l_linenumber — unique; payload = l_comment), split round-robin into
  * `nBatches` equal batches. Prints one JSON line with per-batch ms
  * per mode and the last3/first3 ratio; asserts all three final tables
  * carry identical key sets. Usage: BucketedWriteProbe [sfDir]
  * [nBatches]. */
object BucketedWriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(12)
    val numBuckets = 64
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        concat_ws("|", col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_quantity")).as("v"))
      .dropDuplicates("id") // defensive: the append contract needs unique keys
      .withColumn("__b", pmod(col("id"), lit(nBatches.toLong)).cast("int"))
      .persist()
    val total = rows.count()

    def batch(i: Int): DataFrame =
      rows.filter(col("__b") === i).drop("__b").withColumn("ver", lit(i.toLong))

    def run(mode: String): (String, Seq[Long], Long) = {
      val path = Files.createTempDirectory(s"graft-wprobe-$mode")
        .resolve("t").toString
      val times = (0 until nBatches).map { i =>
        val b = batch(i)
        val t0 = System.nanoTime()
        mode match {
          case "plain" => UpsertWriter.upsert(spark, path, b,
            keys = Seq("id"), versionCol = "ver")
          case "merge" => UpsertWriter.upsertBucketed(spark, path, b,
            keys = Seq("id"), versionCol = "ver", numBuckets = numBuckets)
          case "append" => UpsertWriter.appendBucketed(spark, path, b,
            keys = Seq("id"), batchTag = s"b$i", numBuckets = numBuckets)
        }
        (System.nanoTime() - t0) / 1000000L
      }
      (path, times, spark.read.parquet(path).count())
    }

    val results = Seq("plain", "merge", "append").map(m => m -> run(m)).toMap
    val counts = results.map { case (m, (_, _, n)) => m -> n }
    require(counts.values.toSet.size == 1 && counts("append") == total,
      s"modes diverged in content: $counts vs $total input keys")
    // key-set equality across layouts (order-free xor of key hashes)
    val sums = results.map { case (m, (p, _, _)) =>
      m -> spark.read.parquet(p)
        .agg(bit_xor(xxhash64(col("id"), col("v")))).head().getLong(0)
    }
    require(sums.values.toSet.size == 1, s"modes diverged in values: $sums")

    def ratio(ts: Seq[Long]): Double =
      ts.takeRight(3).sum.toDouble / math.max(1L, ts.take(3).sum).toDouble
    val per = results.map { case (m, (_, ts, _)) =>
      s""""$m":{"per_batch_ms":[${ts.mkString(",")}],""" +
        f""""last3_over_first3":${ratio(ts)}%.2f}"""
    }.mkString(",")
    println(s"""{"metric":"bucketed_write_probe","rows":$total,""" +
      s""""n_batches":$nBatches,"buckets":$numBuckets,$per}""")
    rows.unpersist()
    spark.stop()
  }
}
