package graft

import graft.operators.SkewTools
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The audit→salt wiring: a planted skewed fixture must auto-salt (with a
  * factor derived from the measured hot-key share, not a hand constant)
  * and still return exactly the plain join's rows; a balanced fixture
  * must NOT pay the replication cost. */
class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4000 rows on hot key 7, plus 100 keys × 5 rows of background
  private def skewedFact() = (
    (1 to 4000).map(i => (7L, i.toLong)) ++
      (1 to 100).flatMap(k => (1 to 5).map(i => (k + 100L, i.toLong)))
    ).toDF("k", "v")

  private def dim() =
    ((1 to 100).map(_ + 100L) :+ 7L :+ 999L).toDF("k")
      .withColumn("label", concat(lit("dim-"), col("k")))

  test("audit measures the hot key; saltFactor sizes S from it") {
    val a = SkewTools.audit(skewedFact(), "k")
    assert(a.nKeys == 101 && a.maxRows == 4000 && a.totalRows == 4500)
    assert(a.maxShare > 0.8)
    // healthy task at 4 partitions = 1125 rows → S = ceil(4000/1125) = 4
    assert(SkewTools.saltFactor(a, partitions = 4) == 4)
    // the cap and the don't-salt threshold both engage
    assert(SkewTools.saltFactor(a, partitions = 4, maxFactor = 2) == 2)
    assert(SkewTools.saltFactor(a, partitions = 1) == 1)
    val balanced = SkewTools.SkewAudit("k", 100, 50, 5000)
    assert(SkewTools.saltFactor(balanced, partitions = 4) == 1,
      "a balanced key must not salt")
  }

  test("auto-salted join returns exactly the plain join's rows on a skewed fixture") {
    val fact = skewedFact()
    val d = dim()
    val plain = fact.join(d, Seq("k"))
      .select(col("k"), col("v"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted
    val salted = SkewTools.autoSaltedJoin(fact, d, "k", saltCols = Seq("v"))
      .select(col("k"), col("v"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sorted
    assert(salted.length == plain.length, "salting changed the row count")
    assert(salted.toSeq == plain.toSeq, "salting changed join results")
    // and it really salted: the audit says S=4 at the session's partitions
    val s = SkewTools.saltFactor(SkewTools.audit(fact, "k"),
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    assert(s > 1, "fixture not skewed enough to exercise the salted path")
  }

  test("balanced fixture takes the plain-join path (no dim replication)") {
    val fact = (1 to 1000).map(i => (i.toLong % 100L, i.toLong)).toDF("k", "v")
    val d = (0L until 100L).toDF("k").withColumn("label", lit("x"))
    val joined = SkewTools.autoSaltedJoin(fact, d, "k")
    // plain path leaves no salt machinery in the plan
    assert(!joined.queryExecution.executedPlan.toString.contains("__rep"))
    assert(joined.count() == 1000)
  }

  test("salt assignment is deterministic: identical across runs and repartitions") {
    val fact = skewedFact()
    def assignment(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__salt", SkewTools.saltColumn(df, Nil, 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val run1 = assignment(fact)
    val run2 = assignment(skewedFact())            // fresh lineage, same content
    val run3 = assignment(fact.repartition(13))    // different physical layout
    assert(run1 == run2, "salt changed between two runs over identical content")
    assert(run1 == run3, "salt depends on partition layout")
    // and with explicit saltCols, only those columns matter
    val a = fact.withColumn("__salt", SkewTools.saltColumn(fact, Seq("v"), 4))
      .select(col("v"), col("__salt")).distinct().count()
    val distinctV = fact.select(col("v")).distinct().count()
    assert(a == distinctV, "same saltCols value must always get the same salt")
  }

  test("j10b registered query: the measured-S salted plan carries the replicated dim, and only because the fixture is skewed") {
    val sf = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("j10b_auto_salted")(spark, sf)
    // the executed plan replicates the dim through the exploded sequence
    // (the audit measured a real hot key → S > 1); the '__rep' columns
    // are dropped from the OUTPUT but the machinery shows in the plan
    // (the replication sequence is constant-folded to a literal array,
    // so look for the salt machinery columns, not the sequence() call)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__rep") && plan.contains("__salt"),
      "skewed fixture must take the replicated-dim (salted) path")
    // value identity against the plain join over the same key mapping
    val hotOf = (c: org.apache.spark.sql.Column) =>
      when(pmod(c, lit(4)) =!= 0, lit(1L)).otherwise(c)
    val fact = Tables.lineitem(spark, sf)
      .select(hotOf(col("l_orderkey")).as("hot_key"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    val dim = Tables.orders(spark, sf)
      .groupBy(hotOf(col("o_orderkey")).as("hot_key"))
      .agg(min(col("o_orderpriority")).as("priority"))
    val plain = fact.join(dim, Seq("hot_key"))
      .groupBy(col("priority"))
      .agg(Exprs.dsum(col("revenue")).as("revenue"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    val salted = q.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    assert(salted.toSeq == plain.toSeq,
      "measured-S salted join diverged from the plain join")
  }

  test("row-identity salt (no saltCols) still matches the plain join") {
    val fact = skewedFact()
    val d = dim()
    val plain = fact.join(d, Seq("k"))
      .select(col("k"), col("v"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewTools.autoSaltedJoin(fact, d, "k")
      .select(col("k"), col("v"), col("label"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }
}
