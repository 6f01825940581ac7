package graft.tools

import graft.{Sessions, Tables}
import graft.sinks.UpsertWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import java.nio.file.{Files, Paths}

/** Rebucket-at-scale probe (r12 verdict directive 2): build the same
  * ×K-corpus hash-bucketed keyed state table as [[CompactionProbe]]
  * (two keyed merges + one insert-only append batch, 64 buckets), run
  * [[UpsertWriter.rebucket]] to DOUBLE the bucket count, and assert the
  * invariants the lifecycle op must hold on a growing production
  * corpus:
  *
  *  - CONTENT: row count and an order-free content checksum over the
  *    LOGICAL columns (the bucket column is derived layout and changes
  *    by design) are bit-identical across the rebucket;
  *  - LAYOUT: the pin moves to the new count, every row physically
  *    lives in its `xxhash64(key) % new` bucket directory (zero
  *    misplaced rows — the invariant whose violation silently
  *    duplicates keys on the next pruned merge), and per-bucket volume
  *    halves (the op's whole point: the merge/compaction grain);
  *  - HISTORY: the folded-tag record carries forward — the pre-rebucket
  *    append tag replays as a skipped no-op, not as duplicate rows;
  *  - LIVENESS: a post-rebucket keyed merge at the new count still
  *    prunes (untouched buckets' files byte-identical by (name, size,
  *    fileKey)) and applies keep-latest.
  *
  * Prints one JSON line; non-zero exit on any violated invariant.
  * Usage: RebucketProbe [sfDir] (default /tmp/sf10, the ScaleUp ×100
  * corpus).
  */
object RebucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val oldBuckets = 64
    val newBuckets = 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("graft-rebucket-probe")
      .resolve("t").toString
    val src = Tables.orders(spark, sfDir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      col("o_totalprice"),
      (unix_date(to_date(col("o_orderdate"))).cast(LongType)
        * 10000000000000L + col("o_orderkey")).as("__ver"))
    UpsertWriter.upsertBucketed(spark, wh,
      src.filter(col("o_orderkey") % 2 === 0),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = oldBuckets)
    UpsertWriter.upsertBucketed(spark, wh,
      src.filter(col("o_orderkey") % 2 === 1),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = oldBuckets)
    // one insert-only append batch whose tag must survive the rebucket
    // as a folded no-op (fresh keys outside the orders key space)
    val appendBatch = src.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_custkey", col("o_custkey") + 10000000L)
      .dropDuplicates("o_custkey")
    UpsertWriter.appendBucketed(spark, wh, appendBatch,
      keys = Seq("o_custkey"), batchTag = "probe-append",
      numBuckets = oldBuckets)

    def bucketDirs(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      val list = Files.list(Paths.get(wh))
      try list.iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"${UpsertWriter.BucketCol}="))
        .map(_.getFileName.toString).toList
      finally list.close()
    }
    // checksum over the LOGICAL columns only: the bucket column is
    // derived layout, rewritten by design
    def snapshot(): (Long, Long) = {
      val df = spark.read.parquet(wh).drop(UpsertWriter.BucketCol)
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(df.columns.map(col): _*))).head()
      (r.getLong(0), r.getLong(1))
    }
    def maxBucketBytes(): Long = {
      import scala.jdk.CollectionConverters._
      bucketDirs().map { d =>
        val list = Files.list(Paths.get(wh, d))
        try list.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(Files.size).sum
        finally list.close()
      }.max
    }

    val (nBefore, hashBefore) = snapshot()
    val bucketsBefore = bucketDirs().size
    val maxBytesBefore = maxBucketBytes()
    val t0 = System.nanoTime()
    UpsertWriter.rebucket(spark, wh, keys = Seq("o_custkey"),
      newBuckets = newBuckets)
    val rebucketSec = (System.nanoTime() - t0) / 1e9
    val (nAfter, hashAfter) = snapshot()
    val bucketsAfter = bucketDirs().size
    val maxBytesAfter = maxBucketBytes()

    val contentOk = nBefore == nAfter && hashBefore == hashAfter
    val pinOk = UpsertWriter.pinnedBuckets(wh).contains(newBuckets)
    val misplaced = spark.read.parquet(wh)
      .filter(col(UpsertWriter.BucketCol) =!=
        pmod(xxhash64(col("o_custkey")), lit(newBuckets.toLong)).cast("int"))
      .count()
    val grainOk = bucketsAfter > bucketsBefore &&
      maxBytesAfter < maxBytesBefore
    // folded-tag carry-forward: the pre-rebucket batch replays as a no-op
    val replaySkipped = !UpsertWriter.appendBucketed(spark, wh, appendBatch,
      keys = Seq("o_custkey"), batchTag = "probe-append",
      numBuckets = newBuckets)
    val replayOk = replaySkipped && snapshot() == ((nAfter, hashAfter))

    // liveness: a pruned merge at the NEW count — untouched buckets'
    // files identical by (name, size, fileKey), keep-latest applied
    val probeKey = spark.read.parquet(wh)
      .select(col("o_custkey")).orderBy(col("o_custkey")).limit(1)
      .head().getLong(0)
    val touched = spark.range(1).select(
      pmod(xxhash64(lit(probeKey)), lit(newBuckets.toLong)).cast("int"))
      .head().getInt(0)
    val untouchedBucket = bucketDirs()
      .find(_ != s"${UpsertWriter.BucketCol}=$touched").get
    def fileIdentity(dir: java.io.File): Map[String, (Long, String)] =
      dir.listFiles().map { f =>
        val attrs = Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        f.getName -> ((attrs.size(), String.valueOf(attrs.fileKey())))
      }.toMap
    val untouchedDir = new java.io.File(s"$wh/$untouchedBucket")
    val beforeIds = fileIdentity(untouchedDir)
    UpsertWriter.upsertBucketed(spark, wh,
      spark.range(1).select(lit(probeKey).as("o_custkey"),
        lit(-1L).as("o_orderkey"), lit("2099-12-31").as("o_orderdate"),
        lit(0.0).as("o_totalprice"), lit(Long.MaxValue).as("__ver")),
      keys = Seq("o_custkey"), versionCol = "__ver", numBuckets = newBuckets)
    val mergeVal = spark.read.parquet(wh)
      .filter(col("o_custkey") === probeKey)
      .select(col("o_orderkey")).head().getLong(0)
    val liveOk = fileIdentity(untouchedDir) == beforeIds &&
      mergeVal == -1L && spark.read.parquet(wh).count() == nAfter

    val ok = contentOk && pinOk && misplaced == 0 && grainOk &&
      replayOk && liveOk
    println(s"""{"probe":"rebucket_bucketed","sf_dir":"$sfDir",""" +
      s""""rows":$nBefore,"buckets_before":$bucketsBefore,""" +
      s""""buckets_after":$bucketsAfter,""" +
      s""""content_checksum_stable":$contentOk,"pin_moved":$pinOk,""" +
      s""""misplaced_rows":$misplaced,""" +
      s""""max_bucket_bytes_before":$maxBytesBefore,""" +
      s""""max_bucket_bytes_after":$maxBytesAfter,""" +
      s""""grain_halved":$grainOk,""" +
      s""""folded_tag_replay_noop":$replayOk,""" +
      s""""post_rebucket_merge_prunes":$liveOk,""" +
      f""""rebucket_sec":$rebucketSec%.1f,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
