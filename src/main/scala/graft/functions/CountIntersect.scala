package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `count_intersect(a, b)` ≡ `size(array_intersect(a, b))` for LONG
  * arrays with non-null elements — the count of DISTINCT common
  * elements — without ever materializing the intersection array.
  * `array_intersect` builds a hash set, emits a result array, and then
  * `size` throws it away; per probed row (every edge of the similarity
  * graph, every candidate pair) that is pure allocation. This fuses the
  * two into one sorted two-pointer sweep over primitive longs.
  *
  * Installed as an automatic rewrite by [[IntersectSizeRewrite]], so
  * operator code keeps writing the composed, readable form and every
  * plan gets the fused one — the same contract as Catalyst's own
  * `ReplaceExpressions`. Equivalence (including duplicate elements,
  * which both forms count once) is pinned in `CountIntersectSpec`.
  */
case class CountIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  // INT, not LONG: this is a drop-in replacement for `Size`, whose type
  // is INT — widening would unresolve every parent expression the
  // rewrite touches. (Array cardinality is INT-bounded by definition.)
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "count_intersect needs two ARRAY<BIGINT> (non-null elements) arguments")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CountIntersect.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CountIntersect$$.MODULE$$.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountIntersect =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "count_intersect"
}

object CountIntersect {
  /** Distinct-common-element count: sort primitive copies, two-pointer
    * sweep skipping duplicates — no boxing, no result array. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var n = 0
    while (i < x.length && j < y.length) {
      val vx = x(i); val vy = y(j)
      if (vx < vy) i += 1
      else if (vx > vy) j += 1
      else {
        n += 1
        while (i < x.length && x(i) == vx) i += 1
        while (j < y.length && y(j) == vy) j += 1
      }
    }
    n
  }
}

/** `size(array_intersect(a, b))` → `count_intersect(a, b)` wherever both
  * sides are non-null-element LONG arrays. The guard keeps every other
  * case (other element types, nullable elements — where
  * `array_intersect` can emit a null element the count must include)
  * on the built-in path. */
object IntersectSizeRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), _)
          if a.dataType == ArrayType(LongType, containsNull = false) &&
            b.dataType == ArrayType(LongType, containsNull = false) =>
        CountIntersect(a, b)
    }
}
