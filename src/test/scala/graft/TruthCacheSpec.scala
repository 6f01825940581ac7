package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The content-keyed truth-set cache (round-6 directive #5): repeated
  * benches pay the lossless prefix-filter join once per corpus IMAGE.
  * The contract under test: (a) a second call with identical content is
  * served from the committed parquet, byte-identical; (b) the key is a
  * function of CONTENT, not path or row order, so the driver's mid-round
  * testdata regeneration can never serve a stale truth set; (c) the
  * registered `dedup_lsh_recall` row is identical on cold and warm runs.
  */
class TruthCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  test("cachedParquet builds once, then serves the committed image") {
    import spark.implicits._
    val family = s"truth-cache-spec-${java.util.UUID.randomUUID().toString.take(8)}"
    var builds = 0
    def call() = Fixtures.cachedParquet(spark, family, "k1") {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val first = call().orderBy("id").collect().map(_.toSeq)
    val second = call().orderBy("id").collect().map(_.toSeq)
    assert(builds == 1, s"expected one build, got $builds")
    assert(first.toSeq == second.toSeq)
    // distinct key → fresh build
    Fixtures.cachedParquet(spark, family, "k2") {
      builds += 1
      Seq((3L, "c")).toDF("id", "v")
    }.collect()
    assert(builds == 2)
  }

  test("corpusFingerprint: order-invariant, content- and multiplicity-sensitive") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val fp = operators.DedupOps.corpusFingerprint(docs)
    // row order / partitioning never changes the key
    assert(operators.DedupOps.corpusFingerprint(
      docs.orderBy(desc("doc_id")).repartition(3)) == fp)
    // one character of one doc changes it
    assert(operators.DedupOps.corpusFingerprint(
      docs.withColumn("text",
        when(col("doc_id") === 3, lit("epsilon!")).otherwise(col("text")))) != fp)
    // duplicated rows change it (XOR alone would cancel; the count breaks it)
    assert(operators.DedupOps.corpusFingerprint(docs.union(docs)) != fp)
    // column shuffle trap: (12, "3x") vs (1, "23x") must differ (separator)
    val a = Seq((12L, "3x")).toDF("doc_id", "text")
    val b = Seq((1L, "23x")).toDF("doc_id", "text")
    assert(operators.DedupOps.corpusFingerprint(a) !=
      operators.DedupOps.corpusFingerprint(b))
    assert(operators.DedupOps.corpusFingerprint(docs.limit(0)) == "empty")
  }

  test("dedup_lsh_recall: cold and warm runs return the identical row, cache committed") {
    val docs = Tables.documents(spark, sf)
    val key = operators.DedupOps.corpusFingerprint(docs)
    val dir = Paths.get(
      sys.props.getOrElse("graft.fixtures.dir", ".fixtures"), "truth-w4-j08-v1", key)
    val cold = SparkEntry.queries("dedup_lsh_recall")(spark, sf).collect().map(_.toSeq)
    assert(Files.exists(dir.resolve("_SUCCESS")),
      s"truth cache not committed at $dir")
    val mtime = Files.getLastModifiedTime(dir.resolve("_SUCCESS"))
    val warm = SparkEntry.queries("dedup_lsh_recall")(spark, sf).collect().map(_.toSeq)
    assert(cold.toSeq == warm.toSeq)
    assert(Files.getLastModifiedTime(dir.resolve("_SUCCESS")) == mtime,
      "warm run rebuilt the cache instead of reading it")
  }

  test("cached truth set equals the live lossless prefix-filter join") {
    // dedup_prefix_filter computes the identical truth set live; the cache
    // must reproduce it row-for-row (same docs, same width/threshold).
    val live = SparkEntry.queries("dedup_prefix_filter")(spark, sf)
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq)
    val cached = operators.DedupOps
      .cachedTruth08(spark, Tables.documents(spark, sf))
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq)
    assert(cached.toSeq == live.toSeq)
  }
}
