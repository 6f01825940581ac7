package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Exact, order-independent money sum as a fully codegen'd
  * DeclarativeAggregate — the fast path for [[graft.Exprs.dsum]]'s
  * contract `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  *
  * The decimal form is exact but boxes a BigDecimal per row (precision 38
  * exceeds Spark's compact-long decimal fast path). Here each addend is
  * converted ONCE to scale-6 fixed point (micros) by an exactly-rounded
  * quantizer ([[QuantizeMicros]]), and the aggregation is plain long
  * arithmetic in a (millions, sub-million) two-long buffer; a single
  * BigDecimal materializes per GROUP at finish ([[FinishMoneySum]]).
  *
  * Exactness argument, mirrored in `ExactMoneySumSpec`:
  *  - no IEEE double is exactly halfway between two scale-6 decimals
  *    (that would need a 5^7 denominator), so HALF_UP == round-nearest
  *    and the quantizer's tie branches are unreachable;
  *  - x·10^6 fits double-double exactly (fma residual), and the
  *    nearest-integer decision compares exact quantities only
  *    (Sterbenz-exact `hi−n`, then `(hi−n)∓0.5 ≷ −lo`);
  *  - the two-long buffer holds Σ micros exactly (overflow would THROW
  *    via ANSI long arithmetic, never wrap silently — bound ≈ 9·10^18
  *    micros per buffer lane, ~10^12 rows of 10^6-valued money);
  *  - BigDecimal(Σ micros, 6).doubleValue() is the same correctly-rounded
  *    conversion `Decimal.toDouble` performs.
  */
case class ExactMoneySum(child: Expression) extends DeclarativeAggregate {
  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dsum_exact needs a DOUBLE argument, got ${child.dataType.sql}")

  private lazy val sumHi = AttributeReference("sumHi", LongType, nullable = false)()
  private lazy val sumLo = AttributeReference("sumLo", LongType, nullable = false)()
  private lazy val isEmpty = AttributeReference("isEmpty", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sumHi, sumLo, isEmpty)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(true))

  // ANSI mode pinned explicitly: the documented fail-loud-on-overflow
  // contract must hold regardless of the session's ansi.enabled setting.
  private def ansiAdd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.ANSI)

  override lazy val updateExpressions: Seq[Expression] = {
    val q = QuantizeMicros(child)
    val M = Literal(1000000L)
    // v = qHi·10^6 + qLo with |qLo| < 10^6 (truncating div pairs with %)
    val qHi = IntegralDivide(q, M)
    val qLo = Subtract(q, Multiply(Cast(qHi, LongType), M))
    Seq(
      If(IsNull(child), sumHi, ansiAdd(sumHi, Cast(qHi, LongType))),
      If(IsNull(child), sumLo, ansiAdd(sumLo, qLo)),
      And(isEmpty, IsNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    ansiAdd(sumHi.left, sumHi.right),
    ansiAdd(sumLo.left, sumLo.right),
    And(isEmpty.left, isEmpty.right))

  override lazy val evaluateExpression: Expression =
    If(isEmpty, Literal(null, DoubleType), FinishMoneySum(sumHi, sumLo))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactMoneySum =
    copy(child = newChildren.head)

  override def prettyName: String = "dsum_exact"
}

/** Exactly-rounded `round(x · 10^6)` — the scale-6 HALF_UP decimal cast
  * as long micros, without any BigDecimal. Tie cases cannot occur (see
  * [[ExactMoneySum]]); magnitudes beyond the double-exact window fall
  * back to the BigDecimal path; NaN/Infinity throw like the ANSI
  * decimal cast they replace. */
case class QuantizeMicros(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    QuantizeMicros.quantize(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QuantizeMicros$$.MODULE$$.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeMicros =
    copy(child = newChild)
}

object QuantizeMicros {
  /** |x·10^6| above this uses BigDecimal (double-double and the long cast
    * stay trivially exact far below it; the margin is generous). */
  private val FastWindow = 4.0e18

  def quantize(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(s"cannot quantize $x to DECIMAL(38,6)")
    val hi = x * 1e6
    if (math.abs(hi) > FastWindow)
      return new java.math.BigDecimal(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    val lo = Math.fma(x, 1e6, -hi) // x·10^6 == hi + lo, exactly
    val n = Math.rint(hi)
    val a = hi - n                 // exact (n within ulp of hi)
    // Above 2^53, ulp(hi) > 1 and |lo| can exceed 0.5 — the residual
    // must contribute whole integers, not just a ±1 nudge (the first
    // draft missed this; the fuzzer found an off-by-6 at |x|≈8e10).
    // Knuth TwoSum: s + t == a + lo, exactly.
    val s = a + lo
    val ap = s - lo
    val t = (a - ap) + (lo - (s - ap))
    val m = Math.rint(s)
    val delta = s - m              // exact: multiple of ulp(s), |delta| <= 0.5
    var r = n.toLong + m.toLong
    // exact value e = r + delta + t. Unlike the decimal-vs-double case,
    // ties ARE reachable here: x = odd/2^7 makes x·10^6 exactly a
    // half-integer (10^6/2^7 = 7812.5), so HALF_UP (away from zero) must
    // be applied explicitly. All comparisons are between exact doubles.
    val dHi = delta - 0.5 // exact
    val dLo = delta + 0.5 // exact
    if (dHi > -t) r += 1                      // e > r + 0.5
    else if (dHi == -t) { if (r >= 0) r += 1 } // e == r + 0.5: away from 0
    else if (dLo < -t) r -= 1                 // e < r - 0.5
    else if (dLo == -t) { if (r <= 0) r -= 1 } // e == r - 0.5: away from 0
    r
  }
}

/** `(sumHi·10^6 + sumLo) · 10^-6` as the correctly-rounded double —
  * exactly `Decimal.toDouble` of the decimal sum. One BigDecimal per
  * group, not per row. */
case class FinishMoneySum(hi: Expression, lo: Expression) extends BinaryExpression {
  override def left: Expression = hi
  override def right: Expression = lo
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def nullSafeEval(h: Any, l: Any): Any =
    FinishMoneySum.finish(h.asInstanceOf[Long], l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, l) =>
      s"graft.functions.FinishMoneySum$$.MODULE$$.finish($h, $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FinishMoneySum =
    copy(hi = newLeft, lo = newRight)
}

object FinishMoneySum {
  def finish(hi: Long, lo: Long): Double = {
    val micros = java.math.BigInteger.valueOf(hi)
      .multiply(java.math.BigInteger.valueOf(1000000L))
      .add(java.math.BigInteger.valueOf(lo))
    new java.math.BigDecimal(micros, 6).doubleValue()
  }
}
