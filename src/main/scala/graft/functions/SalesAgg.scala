package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One sales fact row, as consumed by `agregar_vendas`
  * (tarefa_consolidar_dados.php:8-25): quantity, gross revenue, fee,
  * prorated freight, net received. */
final case class SaleRow(
    qtd: Double, fat: Double, tarifa: Double, frete: Double, liquido: Double)

/** Exact-decimal accumulation buffer. Each addend is rounded to scale 6
  * (HALF_UP) before summing — the same contract as [[graft.Exprs.dsum]]'s
  * `CAST(x AS DECIMAL(38,6))` — so the aggregation is order-independent
  * and bit-identical to the built-in decimal-sum pipeline. */
final case class SalesBuf(
    qtd: BigDecimal, fat: BigDecimal, tarifa: BigDecimal,
    frete: BigDecimal, liquido: BigDecimal)

final case class SalesOut(
    sum_qtd: Double, sum_fat: Double, sum_tarifa: Double,
    sum_frete: Double, sum_liquido: Double)

/** Typed `Aggregator` mirror of the reference's `agregar_vendas` hash
  * aggregate (SURVEY §2.10) — functionally redundant with five `dsum`s,
  * implemented to exercise the Aggregator API and proven equivalent to the
  * built-in form in `SalesAggSpec` and by the shared DuckDB oracle of
  * `a2b_agg_sales_udaf`. */
class SalesAgg extends Aggregator[SaleRow, SalesBuf, SalesOut] {
  private def d6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  override def zero: SalesBuf = SalesBuf(0, 0, 0, 0, 0)

  override def reduce(b: SalesBuf, a: SaleRow): SalesBuf = SalesBuf(
    b.qtd + d6(a.qtd), b.fat + d6(a.fat), b.tarifa + d6(a.tarifa),
    b.frete + d6(a.frete), b.liquido + d6(a.liquido))

  override def merge(x: SalesBuf, y: SalesBuf): SalesBuf = SalesBuf(
    x.qtd + y.qtd, x.fat + y.fat, x.tarifa + y.tarifa,
    x.frete + y.frete, x.liquido + y.liquido)

  override def finish(b: SalesBuf): SalesOut = SalesOut(
    b.qtd.toDouble, b.fat.toDouble, b.tarifa.toDouble,
    b.frete.toDouble, b.liquido.toDouble)

  override def bufferEncoder: Encoder[SalesBuf] = Encoders.product[SalesBuf]
  override def outputEncoder: Encoder[SalesOut] = Encoders.product[SalesOut]
}
