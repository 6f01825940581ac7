package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two ARRAY<DOUBLE> columns — the hot scalar
  * of every embedding operator (ANN scoring, cosine near-dup, norms).
  *
  * Replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`,
  * whose lambda chain is evaluated by the interpreted expression walker
  * per element; this compiles to a tight Java loop inside whole-stage
  * codegen. Summation is the identical left-to-right double fold, so
  * results are bit-for-bit the same as the HOF form and the DuckDB
  * oracle's `list_sum` replay (`AnnOpsEquivalenceSpec` asserts both).
  *
  * Null/length semantics mirror the HOF pipeline it replaces: NULL if
  * either array is NULL, contains a NULL element, or lengths differ
  * (zip_with pads with NULL, which poisons the fold to NULL).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements != b.numElements) return null
    var sum = 0.0
    var i = 0
    val n = a.numElements
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lGen.isNull} && !${rGen.isNull}) {
        int $n = ${lGen.value}.numElements();
        if ($n == ${rGen.value}.numElements()) {
          ${ev.isNull} = false;
          for (int $i = 0; $i < $n; $i++) {
            if (${lGen.value}.isNullAt($i) || ${rGen.value}.isNullAt($i)) {
              ${ev.isNull} = true; break;
            }
            ${ev.value} += ${lGen.value}.getDouble($i) * ${rGen.value}.getDouble($i);
          }
        }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}
