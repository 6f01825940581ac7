package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The diagnosis→cure wiring for join-key skew: `dq3_skew_audit` measures
  * (hottest-key share per candidate key) and `j10_salted_skew_join`
  * demonstrates the cure — this connects them, so the mitigation is a
  * LIBRARY CALL with a measured salt factor instead of a hand-tuned
  * constant.
  *
  * Cost model (from the j10 analysis): salting replicates the dim side
  * ×S through the shuffle, so S should be just big enough that the
  * hottest key's rows split into healthy-task-sized chunks —
  * S ≈ ceil(max_rows / healthy_task_rows), where a healthy task holds
  * the balanced share total/partitions. Keys whose hot row-count already
  * fits a couple of healthy tasks don't salt at all (S = 1, plain join,
  * zero replication cost).
  *
  * Value contract: a salted join is row-for-row identical to the plain
  * join — the salt only spreads the hash — pinned by `SkewToolsSpec` on
  * a planted skewed fixture.
  */
object SkewTools {

  /** One-aggregate skew audit of `df` on `key` — the dq3 measurement as
    * a library call (map-side-combined, collapses to one row). */
  final case class SkewAudit(key: String, nKeys: Long, maxRows: Long, totalRows: Long) {
    def maxShare: Double =
      if (totalRows == 0) 0.0 else maxRows.toDouble / totalRows
  }

  def audit(df: DataFrame, key: String): SkewAudit = {
    val r = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"), max(col("cnt")).as("max_rows"),
        sum(col("cnt")).as("total_rows"))
      .head()
    if (r.isNullAt(1)) SkewAudit(key, 0L, 0L, 0L) // empty input
    else SkewAudit(key, r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Salt factor from an audit: 1 (don't salt) unless the hottest key
    * overflows `skewThreshold` healthy tasks; then just enough
    * replication to split it into healthy-task chunks, capped. */
  def saltFactor(
      a: SkewAudit,
      partitions: Int,
      skewThreshold: Double = 2.0,
      maxFactor: Int = 64): Int = {
    if (a.totalRows == 0L || partitions <= 1) 1
    else {
      val healthy = math.max(1L, a.totalRows / partitions)
      if (a.maxRows.toDouble <= skewThreshold * healthy) 1
      else math.min(maxFactor.toLong,
        (a.maxRows + healthy - 1) / healthy).toInt
    }
  }

  /** The deterministic fact-side salt in [0,`s`): a hash of `saltCols`
    * (or of every fact column when none are given) — a pure function of
    * row CONTENT, so a given row gets the same salt on every run and
    * every retry, unlike a `monotonically_increasing_id` salt whose
    * row→task placement varies with partition layout.
    *
    * LIMIT of content salting: rows that are bit-identical get the
    * same salt, so a hot key whose rows are LITERAL duplicates still
    * collapses onto one task — the cure splits a hot key only as far
    * as its rows are distinguishable. For duplicate-heavy facts pass
    * `saltCols` that discriminate physical provenance (file name,
    * batch id) or dedup upstream; a row-position salt would spread
    * duplicates but costs run-to-run reproducibility, the trade this
    * module deliberately refuses. */
  def saltColumn(fact: DataFrame, saltCols: Seq[String], s: Int): Column = {
    val cols = if (saltCols.nonEmpty) saltCols else fact.columns.toSeq
    pmod(hash(cols.map(col): _*), lit(s))
  }

  /** Inner equi-join of `fact` ⋈ `dim` on `key` that AUDITS the fact
    * side first and salts only when the measured skew warrants it
    * (S > 1): the fact side gets a deterministic salt in [0,S) hashed
    * from `saltCols` (non-join columns) or, when none are given, from
    * ALL of the fact's columns — so a given row lands on the same
    * salted task every run, keeping straggler debugging reproducible
    * (a `monotonically_increasing_id` salt would be correct but would
    * reshuffle row→task placement run-to-run). The dim side replicates
    * ×S and the join adds salt = rep to the key — the j10 shape with a
    * measured S. Returns the same rows as `fact.join(dim, key)` in
    * every regime.
    *
    * COST NOTE: the audit aggregation and the join each execute the
    * full `fact` lineage — an expensive upstream pipeline runs TWICE
    * unless the caller `persist`s it first or passes a precomputed
    * audit via the overload below. */
  def autoSaltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltCols: Seq[String] = Nil,
      skewThreshold: Double = 2.0,
      maxFactor: Int = 64): DataFrame =
    autoSaltedJoin(fact, dim, key, audit(fact, key), saltCols,
      skewThreshold, maxFactor)

  /** [[autoSaltedJoin]] with a caller-supplied audit — the single-pass
    * form when the fact lineage is expensive (audit once, reuse). */
  def autoSaltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      precomputed: SkewAudit,
      saltCols: Seq[String],
      skewThreshold: Double,
      maxFactor: Int): DataFrame = {
    val partitions = fact.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val s = saltFactor(precomputed, partitions, skewThreshold, maxFactor)
    if (s == 1) fact.join(dim, Seq(key))
    else {
      val f = fact.withColumn("__salt", saltColumn(fact, saltCols, s))
      val d = dim
        .withColumnRenamed(key, "__dim_key")
        .withColumn("__rep", explode(sequence(lit(0), lit(s - 1))))
      f.join(d, f("__salt") === d("__rep") && f(key) === d("__dim_key"))
        .drop("__salt", "__rep", "__dim_key")
    }
  }
}
