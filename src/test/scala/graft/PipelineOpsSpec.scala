package graft

import graft.operators.{DedupOps, MultimodalOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sanity/determinism checks for the LLM-pipeline family at sf0.001 —
  * the DuckDB oracle is the main correctness gate; these pin behaviors
  * the oracle can't see (stability across runs, stub contract). */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sf0001

  test("dedup_minhash finds the planted near-dup pairs, all ≥ threshold") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, sf).collect()
    assert(pairs.nonEmpty, "no near-dup pairs found — fixture has planted dups")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.8))
    assert(pairs.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("minhash signatures are deterministic across runs") {
    val a = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().map(_.toSeq).toSet
    val b = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ann_topk: ranks are 1..k per query, self excluded, cosine in [-1,1]") {
    val out = SparkEntry.queries("ann_topk_bruteforce")(spark, sf).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements((1 to rows.length).map(_.toLong)))
      assert(rows.forall(_.getAs[Long]("neighbor_id") != q))
      assert(rows.forall { r =>
        val c = r.getAs[Double]("cos_sim")
        c >= -1.0001 && c <= 1.0001
      })
    }
  }

  test("ta_split_leakage_safe: a cluster never straddles splits; all three splits populated") {
    val out = DedupOps.queries("ta_split_leakage_safe")
      .run(spark, sf)
      .select(col("cluster_id"), col("split"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // the leakage guarantee: split is a function of the cluster
    val perCluster = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    perCluster.foreach { case (c, splits) =>
      assert(splits.size == 1, s"cluster $c straddles splits $splits")
    }
    // and the 80/10/10 hash actually lands clusters in every split
    val bySplit = out.map(_._2).groupBy(identity).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"missing split(s): $bySplit")
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
      s"train is not the majority split: $bySplit")
  }

  test("survivor CC fixpoint converges past the fixed-3-round horizon") {
    // Planted diameter-4 chain 1—2—3—4—5: min-label propagation needs 4
    // rounds to reach node 5, one more than the replayable fixed-round
    // query runs — exactly the case the production variant exists for.
    // smallGraphMax = 0 pins the ITERATIVE path (the default would take
    // the single-task union-find on a 4-edge fixture).
    val docs = (1L to 6L).toDF("doc_id") // 6 is an isolated singleton
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val out = DedupOps.survivorsToFixpoint(docs, edges, smallGraphMax = 0)
      .collect()
    val byDoc = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(byDoc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 6L))
    assert(out.count(_.getAs[Boolean]("is_survivor")) == 2) // doc 1 and doc 6
    val rounds = out.head.getAs[Int]("rounds")
    // 1-hop-min init folds the first propagation round into the init
    // aggregation; path halving (each node also adopts its label's
    // label) collapses the remaining chain in 2 rounds + 1 to observe
    // no change — one fewer than plain propagation's 4
    assert(rounds == 3, s"expected 3 rounds, got $rounds")
  }

  test("survivor CC small-graph fast path: identical labels to the iterative rounds") {
    // Mixed shapes — chain, triangle-with-tail, singleton — through
    // BOTH paths: the single-task union-find (default threshold) must
    // produce the exact component-min labels the O(log d) rounds do,
    // because the branch must be invisible to every oracle.
    val docs = (1L to 12L).toDF("doc_id")
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // chain
      (7L, 8L), (8L, 9L), (7L, 9L), (9L, 10L),            // triangle + tail
      (11L, 12L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    def labels(smallMax: Long) =
      DedupOps.survivorsToFixpoint(docs, edges, smallGraphMax = smallMax)
        .select(col("doc_id"), col("cluster_id"), col("is_survivor"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet
    val fast = labels(500000L)
    val iter = labels(0L)
    assert(fast == iter, s"fast path diverged:\n$fast\nvs\n$iter")
    assert(fast.contains((10L, 7L, false)) && fast.contains((6L, 6L, true)))
  }

  test("multimodal decode: batched WAV decode matches the oracle-gated query") {
    val viaQuery = SparkEntry.queries("mm_wav_pcm_decode")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("energy"))).toMap
    // independently: bytes → WavPcm.encode → decodeWavFeatures
    import spark.implicits._
    val synth = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val even = if (raw.length % 2 == 0) raw
          else java.util.Arrays.copyOf(raw, raw.length - 1)
        (id, graft.functions.WavPcm.encodeRaw(even, 16000, 1, 16))
      }).toDF("doc_id", "payload")
    val direct = MultimodalOps.decodeWavFeatures(synth).collect()
      .map(f => f.doc_id -> (f.n_samples, f.energy)).toMap
    assert(direct == viaQuery)
  }

  test("ta_fingerprint: bag-of-words fp ignores word order, rolling fp doesn't") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "alpha beta delta")
    ).toDF("doc_id", "text")
    val toks = split(trim(lower(col("text"))), "\\s+")
    val out = df.select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(toks)), " ")).as("bow"),
      expr("""aggregate(split(trim(lower(text)), '\\s+'), 0L,
             |  (a, t) -> (a * 31 + pmod(CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT),
             |                           1099511627776L)) % 1099511627776L)""".stripMargin)
        .as("rolling"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._1 == out(2L)._1, "bag-of-words fp must be order-free")
    assert(out(1L)._1 != out(3L)._1)
    assert(out(1L)._2 != out(2L)._2, "rolling fp must be order-sensitive")
  }
}
