package graft.operators

import graft.Exprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ENGINE-EXACT HyperLogLog (Flajolet et al., AMS 2007): every register
  * value, the register sum, and the final estimate are bit-identically
  * reproducible in DuckDB SQL, so the sketch queries get REAL oracle
  * twins instead of the rows-only check that engine-specific sketches
  * (Spark HLL++ vs DuckDB approx_count_distinct) force.
  *
  * How exactness is engineered — the same playbook as the integer-exact
  * PageRank ([[GraphOps]]) and the quantized IVF centroids ([[AnnOps]]):
  *
  *  - the hash is [[Exprs.phash]] (md5-derived 60-bit, the repo's
  *    portable family), so both engines compute identical registers;
  *  - rho (leading-zero rank of the 48-bit suffix) is a generated CASE
  *    chain over power-of-two thresholds — pure integer compares, no
  *    floating log2 that could round differently at exact powers;
  *  - the register sum Σ 2^(−M_j) is scaled by 2^RMAX into an INTEGER
  *    sum Σ 2^(RMAX−M_j) (≤ m·2^RMAX = 2^61, no overflow) — integer
  *    addition is order-free, where a double Σ2^(−M_j) would depend on
  *    partition order once the exponent spread exceeds the mantissa;
  *  - only the final estimate touches doubles: one deterministic
  *    division for the raw estimate, and the small-range linear-counting
  *    branch m·ln(m/V) rounds to an INTEGER, so a last-ulp ln()
  *    difference between libm implementations cannot flip the output.
  *
  * Scale posture: this is the 100 TB replacement for distinct shuffles —
  * the map side combines to ≤ m register rows per group per partition,
  * the exchange carries (group, idx, rho) regardless of input size, and
  * register tables MERGE by max(mj) (see `sk4_hll_merge_rollup`: fine
  * sketches union to any coarser grain without re-touching the data).
  * With m = 4096 the standard error is 1.04/√m ≈ 1.6%.
  */
object HllExact {
  /** Register-count exponent: m = 2^P registers. */
  private val P = 12
  val M: Int = 1 << P
  /** Bits left for the rho field after the index: phash is 60-bit. */
  private val FIELD = 60 - P
  /** Max rho: FIELD leading zeros (w = 0) → FIELD + 1. */
  private val RMAX = FIELD + 1
  /** Linear-counting crossover (classic HLL: raw ≤ 2.5m and V > 0). */
  private val LC_THRESHOLD = 2.5 * M

  /** rho = position of the highest set bit of `w`, counted from the top
    * of the FIELD-bit window (1-based); FIELD+1 when w = 0. A CASE chain
    * of integer compares — identical text runs in Spark SQL and DuckDB. */
  private def rhoCase(w: String): String = {
    val whens = (0 until FIELD)
      .map(i => s"WHEN $w >= ${1L << (FIELD - 1 - i)} THEN ${i + 1}")
    s"(CASE ${whens.mkString(" ")} ELSE $RMAX END)"
  }

  /** Register table (group..., idx, mj) for a distinct-count of `key`:
    * mj = max rho per register. This IS the sketch — m rows of mergeable
    * state per group (merge = max per idx). */
  def registers(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame =
    registersWith(df, groupCols, Exprs.phash(key.cast(StringType)))

  /** [[registers]] with the md5-FREE integer hash — the fast-scan form
    * for BIGINT keys ([[hash60]]): same register layout, same estimate
    * contract, ~none of the per-row digest cost that dominates the
    * sketch's one pass over the data at scale. Use when the key is an
    * integer surrogate (the common case for id cardinalities); the
    * md5 form remains the one hash family for arbitrary strings. */
  def registersFast(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame =
    registersWith(df, groupCols, hash60(key.cast(LongType)))

  private def registersWith(df: DataFrame, groupCols: Seq[String], h: Column): DataFrame = {
    val g = groupCols.map(col)
    // NULL keys contribute no register but KEEP their group alive:
    // h = hash(NULL) is NULL → idx NULL, rho forced NULL (unguarded,
    // the rho CASE's ELSE would stamp RMAX and count NULL as one
    // distinct value). [[estimate]] counts only non-NULL registers, so
    // a group whose keys are all NULL estimates 0 — exactly
    // approx_count_distinct's contract; a filter here instead made
    // such groups VANISH from the output.
    df.select(g :+ h.as("h"): _*)
      .select(g ++ Seq(
        pmod(col("h"), lit(M.toLong)).as("idx"),
        when(col("h").isNull, lit(null))
          .otherwise(expr(s"${rhoCase(s"(h div $M)")}")).as("rho")): _*)
      .groupBy(g :+ col("idx"): _*)
      .agg(max(col("rho")).as("mj"))
  }

  // ─────────────────── md5-free 60-bit integer hash ───────────────────

  private val B30 = 1L << 30
  private val Mask30 = B30 - 1
  // murmur3-finalizer / golden-ratio constants for the round functions
  private val RoundA = Seq(2654435769L, 2246822507L, 3266489909L, 2654435761L)
  private val RoundB = Seq(374761393L, 668265263L, 2654435761L, 1597334677L)

  /** PORTABLE 60-bit integer hash with real avalanche: a 4-round
    * Feistel permutation (the Luby–Rackoff construction) on the key's
    * two 30-bit halves, round function = multiply-shift hashing
    * (Dietzfelbinger et al.'s universal family — middle bits of
    * `a·R + b`), halves combined by xor. Affine families (Lehmer/
    * pmix2 streams) are PERMUTATIONS of each residue class — sequential id keys then land in too-uniform
    * a register pattern (too FEW idx collisions vs Poisson), and the
    * linear-counting branch overestimates by ~10% on the fixture; the
    * Feistel xor rounds break that structure (the SketchSpec
    * sequential-key pin is the regression test). Every intermediate
    * stays below 2^62 — exact in any engine's signed 64-bit integers,
    * using only ops both engines define identically on non-negatives
    * (`*`, `+`, `%`, `//`-shift, `&`, xor) — and [[hash60Sql]] replays
    * it bit-for-bit. NULL in → NULL out, the contract
    * [[registersWith]]'s NULL-group handling relies on. */
  private[graft] def hash60(key: Column): Column = {
    val x = pmod(key, lit(1L << 60))
    var l = x.bitwiseAND(lit(Mask30))
    // fold the low half into the high half up front ((l,r)→(l,r⊕l) is
    // still a bijection): id-like keys live entirely in the low 30
    // bits, and a constant-zero high half would waste round 1
    var r = shiftright(x, 30).bitwiseXOR(l)
    for (i <- RoundA.indices) {
      val f = shiftright(r * lit(RoundA(i)) + lit(RoundB(i)), 15)
        .bitwiseAND(lit(Mask30))
      val nr = l.bitwiseXOR(f)
      l = r
      r = nr
    }
    l * lit(B30) + r
  }

  /** Client-side twin of [[hash60]] — an independent implementation in
    * plain JVM arithmetic, used by `Hash60Spec` to pin the Column form
    * (and transitively the SQL twin, which the oracle gate pins against
    * the Column form) against a third computation of the same rounds. */
  private[graft] def hash60Long(key: Long): Long = {
    val m = 1L << 60
    val x = ((key % m) + m) % m
    var l = x & Mask30
    var r = (x >> 30) ^ l
    for (i <- RoundA.indices) {
      val f = ((r * RoundA(i) + RoundB(i)) >> 15) & Mask30
      val nr = l ^ f
      l = r
      r = nr
    }
    l * B30 + r
  }

  /** DuckDB twin of [[hash60]] (floored-mod normalization; `>>`/`&`/
    * `xor()` on non-negative BIGINTs match Spark's shiftright/
    * bitwiseAND/bitwiseXOR bit-for-bit). */
  private[graft] def hash60Sql(x0: String): String = {
    val m = 1L << 60
    val x = s"(((CAST($x0 AS BIGINT) % $m) + $m) % $m)"
    var l = s"($x & $Mask30)"
    var r = s"xor(($x >> 30), $l)"
    for (i <- RoundA.indices) {
      val f = s"(((($r) * ${RoundA(i)} + ${RoundB(i)}) >> 15) & $Mask30)"
      val nr = s"xor($l, $f)"
      l = r
      r = nr
    }
    s"(($l) * $B30 + ($r))"
  }

  /** Collapse a register table to the HLL estimate (BIGINT `outName`).
    * Empty `groupCols` → one global row. */
  def estimate(regs: DataFrame, groupCols: Seq[String], outName: String): DataFrame = {
    val g = groupCols.map(col)
    // count(idx), not count(*): a NULL-idx row is a NULL-key group
    // keeper, not a register — its mj is NULL (sum skips it; coalesce
    // covers the all-NULL group, whose s is then m·2^RMAX → LC → 0)
    val agg = (if (g.isEmpty) regs.groupBy() else regs.groupBy(g: _*))
      .agg(
        (coalesce(sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RMAX - mj)")), lit(0L)) +
          (lit(M.toLong) - count(col("idx"))) * lit(1L << RMAX)).as("s"),
        (lit(M.toLong) - count(col("idx"))).as("v"))
    // alpha_m * m^2 * 2^RMAX / S — every multiplication is an exact
    // power-of-two scaling; the single rounding is the division
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble)) *
      lit(M.toDouble * M) * lit(math.pow(2.0, RMAX)) /
      col("s").cast(DoubleType)
    val est = when(col("v") > 0 && raw <= lit(LC_THRESHOLD),
      round(lit(M.toDouble) * log(lit(M.toDouble) / col("v").cast(DoubleType))))
      .otherwise(round(raw))
      .cast(LongType)
    agg.select(g :+ est.as(outName): _*)
  }

  // ───────────────────────── DuckDB twin ─────────────────────────

  /** CTE pair `<prefix>_r` (registers) + `<prefix>_e` (estimate) —
    * the DuckDB replay of [[registers]] + [[estimate]].
    *
    * @param from     FROM-able relation text (table name or subquery)
    * @param groups   group column names carried through (may be empty)
    * @param keyExpr  SQL expression for the hashed key
    */
  def chainSql(prefix: String, from: String, groups: Seq[String],
      keyExpr: String, outName: String): String = {
    val gsel = groups.map(_ + ", ").mkString
    val regs = registersSql(prefix, from, groups, keyExpr)
    s"""$regs,
       |${estimateSql(prefix, s"${prefix}_r", groups, outName)}""".stripMargin
  }

  /** Just the register CTE `<prefix>_r` (for merge/rollup chains). */
  def registersSql(prefix: String, from: String, groups: Seq[String],
      keyExpr: String): String =
    registersSqlWith(prefix, from, groups,
      Exprs.phashSql(s"CAST($keyExpr AS VARCHAR)"))

  /** DuckDB twin of [[registersFast]] (the md5-free integer hash). */
  def registersFastSql(prefix: String, from: String, groups: Seq[String],
      keyExpr: String): String =
    registersSqlWith(prefix, from, groups, hash60Sql(keyExpr))

  /** [[chainSql]] on the md5-free integer hash ([[registersFast]]). */
  def chainSqlFast(prefix: String, from: String, groups: Seq[String],
      keyExpr: String, outName: String): String =
    s"""${registersFastSql(prefix, from, groups, keyExpr)},
       |${estimateSql(prefix, s"${prefix}_r", groups, outName)}""".stripMargin

  private def registersSqlWith(prefix: String, from: String,
      groups: Seq[String], hExpr: String): String = {
    val gsel = groups.map(_ + ", ").mkString
    val grpIdx = (groups :+ "idx").mkString(", ")
    s"""${prefix}_r AS (
       |  SELECT $gsel idx, max(rho) AS mj
       |  FROM (SELECT $gsel h % $M AS idx,
       |               CASE WHEN h IS NULL THEN NULL
       |                    ELSE ${rhoCase(s"(h // $M)")} END AS rho
       |        FROM (SELECT $gsel $hExpr AS h
       |              FROM $from) ${prefix}_h) ${prefix}_w
       |  GROUP BY $grpIdx)""".stripMargin
  }

  /** Estimate CTE `<prefix>_e` over a register relation (same shape as
    * `<prefix>_r`: groups..., idx, mj). */
  def estimateSql(prefix: String, regsRel: String, groups: Seq[String],
      outName: String): String = {
    val gsel = groups.map(_ + ", ").mkString
    val grpClause = if (groups.isEmpty) "" else s" GROUP BY ${groups.mkString(", ")}"
    s"""${prefix}_e AS (
       |  SELECT $gsel
       |    CAST(ROUND(CASE WHEN v > 0 AND raw <= $LC_THRESHOLD
       |                    THEN $M.0 * ln($M.0 / v)
       |                    ELSE raw END) AS BIGINT) AS $outName
       |  FROM (
       |    SELECT $gsel v,
       |      (0.7213 / (1 + 1.079 / $M.0)) * ${M.toDouble * M} * ${math.pow(2.0, RMAX)}
       |        / CAST(s AS DOUBLE) AS raw
       |    FROM (
       |      SELECT $gsel
       |        coalesce(sum(CAST(1 AS BIGINT) << ($RMAX - mj)), 0)
       |          + ($M - count(idx)) * ${1L << RMAX} AS s,
       |        $M - count(idx) AS v
       |      FROM $regsRel$grpClause) ${prefix}_s) ${prefix}_raw)""".stripMargin
  }
}
