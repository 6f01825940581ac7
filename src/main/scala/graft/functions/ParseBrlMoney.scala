package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the Tiny-ERP decimal-comma money parse:
  * `'1234,56' → 1234.56d` — the `str_replace(',', '.')` + float cast of
  * `tarefa_sincronizar_catalogo_tiny.php:81` as one codegen'd operator
  * (SURVEY §2.10). Whole-string parse; malformed input yields NULL (the
  * reference never sees malformed input — PHP would coerce a prefix, we
  * prefer an explicit null over silent truncation).
  *
  * Accepted grammar is STRICTLY decimal: optional sign, digits, one
  * decimal point, optional exponent. Java-only numeric forms — hex
  * floats ("0x1.8p3"), trailing type suffixes ("12,34d"), "NaN" /
  * "Infinity" — parse as NULL. Spark's own string→double cast accepts
  * those (it delegates to Java parsing); a money column must not, and
  * DuckDB's TRY_CAST agrees with the strict grammar, keeping the oracle
  * twins engine-exact on malformed input.
  *
  * Both the interpreted `nullSafeEval` and the generated Java are exercised
  * against the built-in `translate + cast` pipeline in
  * `ParseBrlMoneySpec` — equivalence on the decimal grammar is the
  * correctness argument; the Java-only forms are pinned as intentional
  * divergence.
  */
case class ParseBrlMoney(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"parse_brl_money needs a STRING argument, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ParseBrlMoney.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = ParseBrlMoney.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${childGen.isNull}) {
        java.lang.Double r = $helper.parse(${childGen.value});
        if (r != null) { ${ev.isNull} = false; ${ev.value} = r.doubleValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): ParseBrlMoney =
    copy(child = newChild)

  override def prettyName: String = "parse_brl_money"
}

object ParseBrlMoney {
  /** Plain decimal literal, optionally signed/exponented. Pre-validation
    * before Double.valueOf, which alone would also accept Java-only forms
    * the translate+cast contract rejects as NULL: hex floats ("0x1.8p3"),
    * trailing type suffixes ("12,34d"), and "NaN"/"Infinity" literals. */
  private val Decimal =
    java.util.regex.Pattern.compile("""[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""")

  /** Shared by interpreted eval and generated code (null = unparseable). */
  def parse(s: UTF8String): java.lang.Double = {
    val normalized = s.toString.replace(',', '.').trim
    if (!Decimal.matcher(normalized).matches()) null
    else java.lang.Double.valueOf(normalized)
  }
}
