package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling — one native call replacing the
  * interpreted HOF tower
  * `array_distinct(transform(sequence(...), i -> concat(toks[i], ...)))`
  * over `split(trim(lower(text)), '\\s+')`.
  *
  * Why: higher-order functions don't participate in whole-stage codegen,
  * so the composed form runs interpreted per row — and shingling is the
  * single hottest scan stage of the whole dedup family (it was also the
  * victim of the InferFiltersFromGenerate re-execution in round 2). One
  * generated call keeps the scan inside codegen.
  *
  * Semantics are BIT-IDENTICAL to the composed form, which is what the
  * DuckDB oracles replay (pinned in `WordShinglesSpec`): lower is
  * UTF8String-lowercase, trim strips 0x20 only (NOT Java `String.trim`,
  * which eats all control chars), and the whitespace split keeps
  * leading/trailing empty tokens exactly like Spark's `split` with its
  * default limit −1 (Java's `String.split` drops trailing empties — a
  * silent divergence this implementation deliberately avoids).
  */
case class WordShingles(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs a STRING text argument, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("word_shingles needs a literal INT n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(text: Any, n: Any): Any =
    WordShingles.shingle(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.WordShingles$$.MODULE$$.shingle($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordShingles =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct n-grams in first-occurrence order (array_distinct
    * semantics), as plain strings — the single source of tokenizer truth
    * shared with [[graft.plans.SimilarityJoinExec]], so the custom
    * physical operator can never drift from the declarative form. */
  def shingleStrings(text: UTF8String, n: Int): Array[String] = {
    // UTF8String lower + trim, THEN limit −1 regex split: the exact
    // pipeline of the composed split(trim(lower(text)), '\s+')
    val toks = Ws.split(text.toLowerCase.trim.toString, -1)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[String](seen.size())
    seen.toArray(arr)
    arr
  }

  /** Shared by interpreted eval and generated code. */
  def shingle(text: UTF8String, n: Int): ArrayData =
    new GenericArrayData(
      shingleStrings(text, n).map(UTF8String.fromString): Array[Any])
}
