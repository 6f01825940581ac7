package graft.tools

import graft.{Sessions, Tables}
import graft.sinks.UpsertWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import java.nio.file.{Files, Paths}

/** Takedown-at-scale probe (round 14): the right-to-be-forgotten path
  * must stay TOUCHED-LEAF-ONLY on a production-size keyed state table —
  * deleting a keyed subset confined to one hash bucket of a ×K-corpus
  * 64-way bucketed table ([[RebucketProbe]]'s construction) must
  * rewrite exactly that bucket and leave the other 63 byte-identical,
  * or at 100 TB every takedown is a corpus rewrite. Asserted:
  *
  *  - EXACTNESS: rows removed == the predicate's match count; the
  *    remaining content checksum equals the source minus the victims
  *    (no co-located key lost, none duplicated);
  *  - LEAF PRUNING: every untouched bucket's files identical by
  *    (name, size, fileKey) — the directories were never rewritten;
  *  - REPLAY SAFETY: a pre-takedown append batch whose deltas the
  *    takedown's rewrite folded replays as a SKIPPED no-op with the
  *    count stable — re-delivery can never resurrect deleted rows;
  *  - LIVENESS: a post-takedown pruned merge still applies keep-latest.
  *
  * Prints one JSON line; non-zero exit on any violated invariant.
  * Usage: TakedownProbe [sfDir] (default /tmp/sf10, the ×100 corpus).
  */
object TakedownProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val numBuckets = 64
    val victimBucket = 7
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val wh = Files.createTempDirectory("graft-takedown-probe")
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
    // one insert-only append whose tag must survive the takedown as a
    // folded no-op (fresh keys outside the orders key space)
    val appendBatch = src.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_custkey", col("o_custkey") + 10000000L)
      .dropDuplicates("o_custkey")
    UpsertWriter.appendBucketed(spark, wh, appendBatch,
      keys = Seq("o_custkey"), batchTag = "probe-append",
      numBuckets = numBuckets)

    def snapshot(pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(wh).drop(UpsertWriter.BucketCol)
        .filter(pred)
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(df.columns.map(col): _*))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def fileIdentity(bucket: Int): Map[String, (Long, String)] = {
      val dir = new java.io.File(
        s"$wh/${UpsertWriter.BucketCol}=$bucket")
      if (!dir.isDirectory) Map.empty
      else dir.listFiles().map { f =>
        val attrs = Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes])
        f.getName -> ((attrs.size(), String.valueOf(attrs.fileKey())))
      }.toMap
    }

    // victims: a keyed subset CONFINED to one bucket — hashed there by
    // the same published function the layout uses, so the probe can
    // assert exactly which leaf a correct takedown may touch
    val isVictim = pmod(xxhash64(col("o_custkey")), lit(numBuckets.toLong))
      .cast("int") === victimBucket && col("o_custkey") % 10 === 3
    val (nBefore, _) = snapshot(lit(true))
    val (expectVictims, _) = snapshot(isVictim)
    val (expectRemain, expectRemainHash) = snapshot(!isVictim)
    val untouched = (0 until numBuckets).filter(_ != victimBucket)
    val idsBefore = untouched.map(b => b -> fileIdentity(b)).toMap

    val t0 = System.nanoTime()
    val removed = UpsertWriter.deleteWhere(spark, wh, isVictim)
    val deleteSec = (System.nanoTime() - t0) / 1e9

    val (nAfter, hashAfter) = snapshot(lit(true))
    val exactOk = removed == expectVictims && nAfter == expectRemain &&
      hashAfter == expectRemainHash && expectVictims > 0
    val rewrittenElsewhere = untouched.count(b =>
      fileIdentity(b) != idsBefore(b))
    val leafOk = rewrittenElsewhere == 0

    // replay safety at scale: the folded pre-takedown append replays
    // as a skipped no-op, count stable — deleted rows stay deleted
    val replaySkipped = !UpsertWriter.appendBucketed(spark, wh, appendBatch,
      keys = Seq("o_custkey"), batchTag = "probe-append",
      numBuckets = numBuckets)
    val replayOk = replaySkipped && snapshot(lit(true))._1 == nAfter

    // liveness: a post-takedown pruned merge applies keep-latest
    val probeKey = spark.read.parquet(wh)
      .select(col("o_custkey")).orderBy(col("o_custkey")).limit(1)
      .head().getLong(0)
    UpsertWriter.upsertBucketed(spark, wh,
      spark.range(1).select(lit(probeKey).as("o_custkey"),
        lit(-1L).as("o_orderkey"), lit("2099-12-31").as("o_orderdate"),
        lit(0.0).as("o_totalprice"), lit(Long.MaxValue).as("__ver")),
      keys = Seq("o_custkey"), versionCol = "__ver",
      numBuckets = numBuckets)
    val liveOk = spark.read.parquet(wh)
      .filter(col("o_custkey") === probeKey)
      .select(col("o_orderkey")).head().getLong(0) == -1L &&
      spark.read.parquet(wh).count() == nAfter

    val ok = exactOk && leafOk && replayOk && liveOk
    println(s"""{"probe":"takedown_bucketed","sf_dir":"$sfDir",""" +
      s""""rows":$nBefore,"buckets":$numBuckets,""" +
      s""""victims":$removed,"expected_victims":$expectVictims,""" +
      f""""delete_sec":$deleteSec%.1f,""" +
      s""""remaining_checksum_matches_source_minus_victims":$exactOk,""" +
      s""""untouched_buckets_rewritten":$rewrittenElsewhere,""" +
      s""""touched_leaf_only":$leafOk,""" +
      s""""folded_tag_replay_skipped":$replayOk,""" +
      s""""post_takedown_merge_ok":$liveOk,"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
