package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** ACCURACY contracts for the sketch family. Since round 5 the HLL rows
  * (sk1/sk4/sk6) are engine-exact ([[graft.operators.HllExact]]) and the
  * driver's DuckDB oracle replays their registers bit-for-bit — but an
  * oracle twin only proves both engines compute the SAME number, not
  * that the number is a good estimate. That second half lives here:
  * every approximate count within 5% of the exact distinct count
  * (m = 4096 registers → rsd ≈ 1.6%; the small fixture cardinalities
  * ride the linear-counting branch, tighter still). sk3/sk5 remain
  * engine-specific (GK / Space-Saving) → these pins are their ONLY
  * numeric gate. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sk1: approx distinct counts within 5% of exact on the fixture") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk1_hll_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (eo, ep)) <- exact) {
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
    }
  }

  test("sk9: md5-free hash matches the accuracy contract, incl. sequential keys") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk9_hll_fast_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (eo, ep)) <- exact) {
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
    }
    // 100k SEQUENTIAL keys — the adversarial input for a weak integer
    // hash (the fixture cardinalities ride linear counting; this pushes
    // the estimate onto the raw-HLL branch, where register-rank bias
    // from a non-avalanching hash would surface as gross error)
    import spark.implicits._
    val seqKeys = spark.range(1, 100001).toDF("key")
    val est = graft.operators.HllExact.estimate(
      graft.operators.HllExact.registersFast(seqKeys, Nil, col("key")),
      Nil, "n").head().getLong(0)
    assert(math.abs(est - 100000L).toDouble / 100000 < 0.05,
      s"sequential-key estimate $est strayed >5% from 100000")
  }

  test("sk1: NULL keys contribute nothing to the HLL estimate") {
    import spark.implicits._
    val withNulls = ((1 to 200).map(i => Some(s"k$i")) ++
      Seq.fill(50)(Option.empty[String])).toDF("key")
    val est = graft.operators.HllExact.estimate(
      graft.operators.HllExact.registers(withNulls, Nil, col("key")),
      Nil, "est").head().getLong(0)
    val estNoNull = graft.operators.HllExact.estimate(
      graft.operators.HllExact.registers(
        withNulls.filter(col("key").isNotNull), Nil, col("key")),
      Nil, "est").head().getLong(0)
    assert(est == estNoNull,
      "NULL keys must be ignored, matching approx_count_distinct")
    assert(math.abs(est - 200).toDouble / 200 < 0.05)
  }

  test("sk1: a group whose keys are ALL NULL estimates 0 — it must not vanish") {
    import spark.implicits._
    // approx_count_distinct's contract: grouped aggregation keeps the
    // group and reports 0; a register-level NULL filter made it vanish
    val df = Seq(("a", Some("k1")), ("a", Some("k2")),
      ("b", Option.empty[String]), ("b", Option.empty[String]))
      .toDF("g", "key")
    val est = graft.operators.HllExact.estimate(
      graft.operators.HllExact.registers(df, Seq("g"), col("key")),
      Seq("g"), "est")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 2L, "b" -> 0L),
      s"all-NULL group must survive with estimate 0: $est")
    // ungrouped all-NULL input: one row, estimate 0 (not NULL, not empty)
    val global = graft.operators.HllExact.estimate(
      graft.operators.HllExact.registers(
        Seq(Option.empty[String]).toDF("key"), Nil, col("key")),
      Nil, "est").collect()
    assert(global.length == 1 && !global.head.isNullAt(0) &&
      global.head.getLong(0) == 0L,
      "all-NULL ungrouped input must estimate 0")
  }

  test("sk3: approx quantiles within GK rank-error bound of the exact values") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk3_approx_quantiles")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // GK with accuracy a guarantees rank error ≤ n/a — but the sketch
    // returns an actual data value while `percentile` interpolates
    // between neighbors, so the window needs slack beyond 1/a for the
    // interpolation gap. 0.005 (≈ half a percentile) is still far
    // tighter than any plausible sketch failure.
    val eps = 0.005
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5 - eps)).as("lo50"),
        percentile(col("l_extendedprice"), lit(0.5 + eps)).as("hi50"),
        percentile(col("l_extendedprice"), lit(0.9 - eps)).as("lo90"),
        percentile(col("l_extendedprice"), lit(0.9 + eps)).as("hi90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (a50, a90)) <- approx) {
      val (lo50, hi50, lo90, hi90) = exact(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k median $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$k p90 $a90 outside [$lo90,$hi90]")
    }
  }

  test("sk4: merged HLL sketches estimate within 5% of exact distinct at the coarse grain") {
    val sf = TestSpark.sf0001
    val merged = SparkEntry.queries("sk4_hll_merge_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    for ((k, e) <- exact)
      assert(math.abs(merged(k) - e) / e < 0.05, s"$k: ${merged(k)} vs $e")
  }

  /** Space-Saving guarantees hold for ANY partition layout; forcing 7
    * partitions over planted frequencies exercises the parallel merge
    * path (absent-key floors + capacity trim), not just the single
    * -buffer update. */
  test("sk5: Space-Saving sketch honors est bounds and reports every > n/k item under merges") {
    import spark.implicits._
    val k = 8
    // planted stream: 3 heavies far above n/k, a mid band, and a long
    // tail that forces evictions at capacity 8
    val items =
      Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++ Seq.fill(200)("gamma") ++
        Seq.fill(40)("delta") ++ Seq.fill(30)("epsilon") ++
        (1 to 300).flatMap(i => Seq.fill(2)(s"tail$i"))
    val n = items.size
    val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val sketch = items.toDF("item")
      .repartition(7)
      .agg(call_function("freq_items_sketch", col("item"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sketch.length <= k)
    for ((item, est, err) <- sketch) {
      val truth = exact.getOrElse(item, 0L)
      assert(truth <= est, s"$item: true $truth > est $est")
      assert(est - err <= truth, s"$item: lower bound ${est - err} > true $truth")
    }
    // frequent-items guarantee: everything above n/k must be reported
    val reported = sketch.map(_._1).toSet
    for ((item, c) <- exact if c > n / k)
      assert(reported.contains(item), s"heavy item $item (count $c > ${n / k}) missing")
    // and the clear heavies should surface regardless of merge order
    assert(Set("alpha", "beta", "gamma").subsetOf(reported))
  }

  test("sk7: KMV sample quantiles sit within the sampling rank window of the exact values") {
    val sf = TestSpark.sf0001
    val approx = SparkEntry.queries("sk7_kmv_quantiles")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // KMV with k = 256: quantile rank-error stddev = sqrt(q(1-q)/k) ≈
    // 0.031 at the median, 0.019 at p90 — ±0.10 is a > 3σ window.
    val eps = 0.10
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_extendedprice"), lit(0.5 - eps)).as("lo50"),
        percentile(col("l_extendedprice"), lit(0.5 + eps)).as("hi50"),
        percentile(col("l_extendedprice"), lit(0.9 - eps)).as("lo90"),
        percentile(col("l_extendedprice"), lit(1.0.min(0.9 + eps))).as("hi90"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (a50, a90)) <- approx) {
      val (lo50, hi50, lo90, hi90) = exact(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k median $a50 outside [$lo50,$hi50]")
      assert(a90 >= lo90 && a90 <= hi90, s"$k p90 $a90 outside [$lo90,$hi90]")
    }
  }

  /** The property that makes bottom-k the 100 TB shape: per-shard
    * bottom-k sketches union to the corpus bottom-k without re-touching
    * the data (same claim HLL registers make via max-merge). */
  test("sk7: bottom-k sketches merge — bottom-k of unioned bottom-ks = direct bottom-k") {
    import spark.implicits._
    val k = 16
    def bottomK(df: DataFrame): DataFrame = df
      .withColumn("h", Exprs.phash(col("v").cast(StringType)))
      .withColumn("r", row_number().over(Window.orderBy(col("h"), col("v"))))
      .filter(col("r") <= k)
      .select(col("v"))
    val a = (1 to 500).map(i => s"a$i").toDF("v")
    val b = (1 to 500).map(i => s"b$i").toDF("v")
    val direct = bottomK(a.unionByName(b)).collect().map(_.getString(0)).toSet
    val merged = bottomK(bottomK(a).unionByName(bottomK(b)))
      .collect().map(_.getString(0)).toSet
    assert(direct == merged, s"merged bottom-k diverged: $direct vs $merged")
  }

  test("sk8: sampled heavy-hitter estimates track exact counts and surface the true top items") {
    val sf = TestSpark.sf0001
    val est = SparkEntry.queries("sk8_sampled_freq")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.documents(spark, sf)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("item"))
      .filter(col("item") =!= "")
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1-in-4 doc sampling: the reported items are corpus-wide frequent
    // tokens appearing across hundreds of sampled docs, so the HT
    // estimate rides a large effective sample — 35% is a generous band.
    for ((item, e) <- est) {
      val t = exact.getOrElse(item, 0L)
      assert(t > 0, s"$item reported but absent from corpus")
      assert(math.abs(e - t).toDouble / t < 0.35, s"$item: est $e vs true $t")
    }
    val top3 = exact.toSeq.sortBy { case (i, n) => (-n, i) }.take(3).map(_._1).toSet
    assert(top3.subsetOf(est.keySet), s"true top-3 $top3 not all reported")
  }

  test("sk6: HLL inclusion-exclusion overlap estimate tracks the exact repeat-buyer count") {
    val sf = TestSpark.sf0001
    val row = SparkEntry.queries("sk6_hll_overlap")(spark, sf).head()
    val estOverlap = row.getLong(3).toDouble
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val exact = o.filter(col("y") === 1996).select("o_custkey").distinct()
      .intersect(o.filter(col("y") === 1997).select("o_custkey").distinct())
      .count()
    // inclusion-exclusion compounds three lgK=12 sketch errors; the
    // overlap here is a large fraction of each cohort, so 10% is ample
    assert(math.abs(estOverlap - exact) / exact < 0.10,
      s"overlap estimate $estOverlap vs exact $exact")
  }

  /** Grouped aggregation drives the serialized-buffer path per group
    * (partial buffers serialize into the shuffle, deserialize at final)
    * — each group's sketch must honor the same bounds independently. */
  test("sk5: grouped Space-Saving sketches keep per-group guarantees") {
    import spark.implicits._
    val k = 4
    val rows =
      (Seq.fill(100)("hot_a") ++ (1 to 60).map(i => s"a$i")).map(("ga", _)) ++
        (Seq.fill(80)("hot_b") ++ (1 to 40).map(i => s"b$i")).map(("gb", _))
    val out = rows.toDF("grp", "item")
      .repartition(5)
      .groupBy(col("grp"))
      .agg(call_function("freq_items_sketch", col("item"), lit(k)).as("sk"))
      .select(col("grp"), explode(col("sk")).as("e"))
      .select(col("grp"), col("e.item"), col("e.est"), col("e.err"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val exact = rows.groupBy(identity).map { case ((g, i), xs) => (g, i) -> xs.size.toLong }
    for ((g, item, est, err) <- out) {
      val truth = exact.getOrElse((g, item), 0L)
      assert(truth <= est && est - err <= truth, s"($g,$item): [$est,$err] vs $truth")
    }
    val reported = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(reported("ga").contains("hot_a") && !reported("ga").exists(_.startsWith("hot_b")))
    assert(reported("gb").contains("hot_b") && !reported("gb").exists(_.startsWith("hot_a")))
  }
}
