package graft.operators

import graft.{Exprs, OpModule, Q, Tables}
import graft.functions.{SaleRow, SalesAgg}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.10 / §7 custom Catalyst pieces, each registered as a query
  * whose DuckDB oracle is the BUILT-IN equivalent — the oracle match IS
  * the equivalence proof at fixture scale (unit tests cover edge cases).
  */
object CustomFnOps extends OpModule {
  import Exprs.dsumSql

  /** Temp-register the custom functions (single source of truth is
    * [[graft.Functions.all]] — this is just the convenience alias the
    * specs use on sessions that bypass `Sessions.tune`). */
  def registerParseBrlMoney(s: SparkSession): Unit =
    graft.Functions.register(s)

  def queries: Map[String, Q] = Map(
    // ── Native codegen Expression vs translate+cast (C6). ──
    "c6b_parse_brl_expression" -> Q(
      (s, d) => {
        registerParseBrlMoney(s)
        Tables
          .part(s, d)
          .withColumn(
            "custo_brl",
            translate(col("p_retailprice").cast(DecimalType(12, 2)).cast(StringType),
              ".", ","))
          .select(
            col("p_partkey"),
            expr("parse_brl_money(custo_brl)").as("custo_produto"))
      },
      Some("""SELECT p_partkey,
             |  CAST(REPLACE(REPLACE(CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR),
             |                       '.', ','), ',', '.') AS DOUBLE) AS custo_produto
             |FROM part ORDER BY p_partkey""".stripMargin),
      doc = "SURVEY §2.10 — ParseBrlMoney Expression (codegen) ≡ translate+cast",
      sort = Seq("p_partkey")
    ),

    // ── Typed Aggregator vs five decimal sums (A2). ──
    "a2b_agg_sales_udaf" -> Q(
      (s, d) => {
        val salesAgg = udaf(new SalesAgg, Encoders.product[SaleRow])
        Tables
          .lineitem(s, d)
          .groupBy(col("l_returnflag").as("grp"))
          .agg(salesAgg(
            col("l_quantity"),
            col("l_extendedprice"),
            col("l_extendedprice") * col("l_tax"),
            col("l_extendedprice") * col("l_discount"),
            col("l_extendedprice") * (lit(1.0) - col("l_tax") - col("l_discount")))
            .as("s"))
          .select(col("grp"),
            col("s.sum_qtd").as("sum_qtd"),
            col("s.sum_fat").as("sum_fat"),
            col("s.sum_tarifa").as("sum_tarifa"),
            col("s.sum_frete").as("sum_frete"),
            col("s.sum_liquido").as("sum_liquido"))
      },
      Some(s"""SELECT l_returnflag AS grp,
              |  ${dsumSql("l_quantity")} AS sum_qtd,
              |  ${dsumSql("l_extendedprice")} AS sum_fat,
              |  ${dsumSql("l_extendedprice * l_tax")} AS sum_tarifa,
              |  ${dsumSql("l_extendedprice * l_discount")} AS sum_frete,
              |  ${dsumSql("l_extendedprice * (1.0 - l_tax - l_discount)")} AS sum_liquido
              |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "SURVEY §2.10 — SalesAgg Aggregator ≡ five dsum aggregates",
      sort = Seq("grp")
    ),

    // ── The SQL front door, gated end-to-end: this query is authored as
    // SQL TEXT through [[graft.Catalog]]'s temp views (the "switch and
    // run every query they run today" path), and its shape — a
    // correlated scalar subquery — is one Catalyst must de-correlate
    // into an aggregate + join to execute at all (a per-row subquery
    // would be the reference's N+1 anti-pattern at engine scale). Max
    // over doubles is exact, so ties and engine drift are impossible;
    // customers whose max is shared by several orders emit all of them
    // in both engines. ──
    "sql1_correlated_max" -> Q(
      (s, d) => {
        graft.Catalog.registerAll(s, d)
        s.sql("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
                |FROM orders o
                |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice)
                |                        FROM orders o2
                |                        WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
      },
      Some("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
             |FROM orders o
             |WHERE o.o_totalprice = (SELECT max(o2.o_totalprice)
             |                        FROM orders o2
             |                        WHERE o2.o_custkey = o.o_custkey)
             |ORDER BY o.o_orderkey""".stripMargin),
      doc = "Extension: SQL-text query via Catalog views with a correlated scalar subquery (de-correlated by Catalyst)",
      sort = Seq("o_orderkey")
    )
  )
}
