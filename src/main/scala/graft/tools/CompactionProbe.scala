package graft.tools

import graft.{Sessions, Tables}
import graft.sinks.UpsertWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import java.nio.file.{Files, Paths}

/** Maintenance-pass probe at the ×10 corpus (r10 verdict directive 6):
  * build a hash-bucketed keyed state table from the probe corpus's
  * orders (the `k1b_upsert_bucketed` shape — two
  * [[UpsertWriter.upsertBucketed]] merges, even then odd orderkeys),
  * run [[UpsertWriter.compact]], and assert the invariants a
  * production maintenance window depends on:
  *
  *  - CONTENT: row count and an order-free content checksum
  *    (bit_xor of xxhash64 over every column incl. the bucket) are
  *    bit-identical across the compaction;
  *  - LAYOUT: every bucket directory survives, the `.__buckets` pin
  *    survives, and the accreted per-merge files collapse to one file
  *    per bucket;
  *  - LIVENESS: a post-compaction bucketed merge still prunes (only
  *    touched buckets rewritten) and applies keep-latest correctly.
  *
  * Prints one JSON line; non-zero exit on any violated invariant.
  * Usage: CompactionProbe [sfDir] (default /tmp/sf1, the ScaleUp ×10
  * corpus).
  */
object CompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val numBuckets = 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("graft-compact-probe")
      .resolve("t").toString
    val src = Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"),
      (unix_date(to_date(col("o_orderdate"))).cast(LongType)
        * 10000000000000L + col("o_orderkey")).as("__ver"))
    UpsertWriter.upsertBucketed(spark, wh,
      src.filter(col("o_orderkey") % 2 === 0),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = numBuckets)
    UpsertWriter.upsertBucketed(spark, wh,
      src.filter(col("o_orderkey") % 2 === 1),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = numBuckets)
    // one insert-only APPEND batch on top (the workers' firehose form):
    // fresh keys outside the orders key space land as delta files (rows
    // cloned from the source so every column type matches the base
    // exactly — appends refuse type drift), and the compaction below
    // must fold them in losslessly
    UpsertWriter.appendBucketed(spark, wh,
      src.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_custkey", col("o_custkey") + 10000000L)
        .dropDuplicates("o_custkey"), // appends insert DISTINCT new keys
      keys = Seq("o_custkey"), batchTag = "probe-append",
      numBuckets = numBuckets)

    def parquetFilesPerBucket(): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      val list = Files.list(Paths.get(wh))
      val buckets = try list.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"${UpsertWriter.BucketCol}="))
        .toList finally list.close()
      buckets.map { b =>
        val fl = Files.list(b)
        val n = try fl.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet"))
        finally fl.close()
        b.getFileName.toString -> n
      }.toMap
    }
    def snapshot(): (Long, Long) = {
      val df = spark.read.parquet(wh)
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(df.columns.map(col): _*))).head()
      (r.getLong(0), r.getLong(1))
    }

    val filesBefore = parquetFilesPerBucket()
    val (nBefore, hashBefore) = snapshot()
    val t0 = System.nanoTime()
    UpsertWriter.compact(spark, wh)
    val compactSec = (System.nanoTime() - t0) / 1e9
    val filesAfter = parquetFilesPerBucket()
    val (nAfter, hashAfter) = snapshot()

    val contentOk = nBefore == nAfter && hashBefore == hashAfter
    val layoutOk = filesAfter.keySet == filesBefore.keySet &&
      Files.exists(Paths.get(wh + ".__buckets"))
    val compactedOk = filesAfter.values.forall(_ == 1) &&
      filesBefore.values.sum > filesAfter.values.sum

    // liveness: one more pruned merge — update a single key, then check
    // keep-latest applied and untouched buckets' files were not rewritten
    val probeKey = spark.read.parquet(wh)
      .select(col("o_custkey")).orderBy(col("o_custkey")).limit(1)
      .head().getLong(0)
    val touched = spark.range(1).select(
      pmod(xxhash64(lit(probeKey)), lit(numBuckets.toLong)).cast("int"))
      .head().getInt(0)
    val untouchedBucket = filesAfter.keySet
      .find(_ != s"${UpsertWriter.BucketCol}=$touched").get
    val untouchedDir = new java.io.File(s"$wh/$untouchedBucket")
    // identity = (name, size, filesystem fileKey/inode): mtime is a weak
    // proxy for "not rewritten" — coarse (1s) mtime granularity would
    // false-pass a same-second rewrite, and a same-content rewrite under
    // a new part- name would false-fail. A rewrite (the leaf swap
    // replaces the whole directory) always allocates new inodes, so the
    // fileKey changes even when name, size, and content are identical.
    def fileIdentity(dir: java.io.File): Map[String, (Long, String)] =
      dir.listFiles().map { f =>
        val attrs = Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        f.getName -> ((attrs.size(), String.valueOf(attrs.fileKey())))
      }.toMap
    val beforeIds = fileIdentity(untouchedDir)
    UpsertWriter.upsertBucketed(spark, wh,
      spark.range(1).select(lit(probeKey).as("o_custkey"),
        lit(-1L).as("o_orderkey"), lit("2099-12-31").as("o_orderdate"),
        lit(0.0).as("o_totalprice"), lit(Long.MaxValue).as("__ver")),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = numBuckets)
    val afterIds = fileIdentity(untouchedDir)
    val mergeVal = spark.read.parquet(wh)
      .filter(col("o_custkey") === probeKey)
      .select(col("o_orderkey")).head().getLong(0)
    val liveOk = beforeIds == afterIds && mergeVal == -1L &&
      spark.read.parquet(wh).count() == nAfter

    val ok = contentOk && layoutOk && compactedOk && liveOk
    println(s"""{"probe":"compaction_bucketed","sf_dir":"$sfDir",""" +
      s""""rows":$nBefore,"content_checksum_stable":$contentOk,""" +
      s""""buckets":${filesBefore.size},""" +
      s""""files_before":${filesBefore.values.sum},""" +
      s""""files_after":${filesAfter.values.sum},""" +
      s""""one_file_per_bucket":${filesAfter.values.forall(_ == 1)},""" +
      s""""layout_preserved":$layoutOk,""" +
      s""""post_compaction_merge_prunes":$liveOk,""" +
      f""""compact_sec":$compactSec%.1f,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
