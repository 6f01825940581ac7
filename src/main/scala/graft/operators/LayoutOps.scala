package graft.operators

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the standard lakehouse tool for
  * making ONE physical sort order serve range predicates on TWO columns.
  * At 100 TB the scan cost of a query is decided before it runs, by which
  * files its predicates can skip: a layout sorted on `x` alone gives
  * perfect min/max pruning on `x` and none on `y`; sorting by the
  * interleaved-bit z-value gives each file a small bounding BOX in
  * (x, y), so a query selective in both dimensions skips in both.
  *
  * Everything here is integer-exact and engine-portable: dimensions are
  * min-max scaled to 16 bits with `div` arithmetic, and the bit
  * interleave is the classic mask-spread (shift/and/or on BIGINT) — the
  * same expressions evaluate bit-identically in Spark and DuckDB, so the
  * curve itself is oracle-verifiable, not just its row counts.
  *
  * Reference behavior ground: the reference engine keeps no explicit
  * layout tooling (its MySQL tables are clustered by primary key only —
  * e.g. `mapa_skus` PK in schema.sql:14), which is exactly the
  * one-dimension layout this operator generalizes.
  */
object LayoutOps extends OpModule {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i
    * (0 ≤ c ≤ 65535 → result < 2^32, even bit positions only). */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** SQL twin of [[spread16]] (DuckDB `<<`/`&`/`|` on BIGINT — identical
    * two's-complement semantics; parenthesized against precedence). */
  private def spreadSql(e: String): String = {
    val a = s"((($e) | (($e) << 8)) & 16711935)"
    val b = s"((($a) | (($a) << 4)) & 252645135)"
    val d = s"((($b) | (($b) << 2)) & 858993459)"
    s"((($d) | (($d) << 1)) & 1431655765)"
  }

  /** Interleaved 32-bit z-value of two 16-bit normalized coordinates. */
  def zvalue16(nx: Column, ny: Column): Column =
    spread16(nx).bitwiseOR(shiftleft(spread16(ny), 1))

  /** Min-max scale to [0, 65535] in pure LONG arithmetic (SQL-string
    * form: Spark and DuckDB variants differ only in the integer-division
    * spelling — both operands are non-negative, so Spark's truncating
    * `div` and DuckDB's flooring `//` agree). Degenerate (constant)
    * dimensions map to 0 via the `greatest(..., 1)` guard. Domain:
    * |x·65535| within LONG — any realistic surrogate key. */
  private def normSql(x: String, mn: String, mx: String, idiv: String): String =
    s"((($x) - ($mn)) * 65535) $idiv greatest(($mx) - ($mn), 1)"

  /** Attach the z-value of (`cx`, `cy`) as column `z`, normalizing both
    * dimensions from their observed min/max (one tiny broadcast agg —
    * never a driver collect). */
  def withZValue(df: DataFrame, cx: String, cy: String): DataFrame = {
    val bounds = df.agg(
      min(col(cx)).as("__minx"), max(col(cx)).as("__maxx"),
      min(col(cy)).as("__miny"), max(col(cy)).as("__maxy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z", zvalue16(
        expr(normSql(cx, "__minx", "__maxx", "div")),
        expr(normSql(cy, "__miny", "__maxy", "div"))))
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }

  /** Production write path: lay `df` out as `numFiles` z-ordered files.
    * `repartitionByRange` on z gives contiguous curve segments per file
    * (range exchange = sample + 1 shuffle, the same cost as any global
    * sort), `sortWithinPartitions` orders rows inside each file so
    * parquet row-group stats prune at sub-file grain too, and the helper
    * column is projected away before hitting disk. */
  def zorderWrite(df: DataFrame, cx: String, cy: String,
      path: String, numFiles: Int): Unit =
    withZValue(df, cx, cy)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)

  def queries: Map[String, Q] = Map(
    // ── The skipping-index relation a z-ordered layout yields: bucket
    // lineitem by 64 equal z-ranges of (l_partkey, l_suppkey) — bucket i
    // = one would-be file, `z div 2^26` since z < 2^32 — and emit each
    // bucket's row count and per-dimension bounding box. This is
    // EXACTLY the min/max metadata a lakehouse consults before opening
    // files; `ZOrderLayoutSpec` drives a 2-D box query against it and
    // checks it skips what a partkey-only layout cannot. The whole plan
    // is one broadcast agg + one map + one 64-group hash agg — scan
    // speed at any corpus size. ──
    "layout_zorder" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"))
        withZValue(li, "l_partkey", "l_suppkey")
          .select(col("l_partkey"), col("l_suppkey"),
            expr("z div 67108864").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("min_pk"),
            max(col("l_partkey")).as("max_pk"),
            min(col("l_suppkey")).as("min_sk"),
            max(col("l_suppkey")).as("max_sk"))
      },
      Some {
        val nx = normSql("l_partkey", "b.minp", "b.maxp", "//")
        val ny = normSql("l_suppkey", "b.mins", "b.maxs", "//")
        s"""WITH b AS (
           |  SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp,
           |         min(l_suppkey) AS mins, max(l_suppkey) AS maxs
           |  FROM lineitem),
           |z AS (
           |  SELECT l_partkey, l_suppkey,
           |    ((${spreadSql(nx)}) | ((${spreadSql(ny)}) << 1)) AS z
           |  FROM lineitem, b)
           |SELECT z // 67108864 AS bucket, count(*)::BIGINT AS n_rows,
           |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
           |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
           |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
      },
      doc = "Extension: z-order layout skipping index (Morton interleave of two key columns, per-bucket bounding boxes)",
      sort = Seq("bucket")
    )
  )
}
