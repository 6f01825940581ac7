package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_explode(text, n)` — distinct word n-gram shingles as ROWS,
  * a custom Catalyst `Generator` (the UDTF surface; the library's other
  * extension points are Expressions, three aggregate forms, and a whole
  * physical operator — this completes the set).
  *
  * `explode(word_shingles(text, n))` materializes the full shingle ARRAY
  * as a column value, hands it to `Generate`, and only then row-izes it.
  * This generator emits rows straight from the tokenizer, so no plan
  * edge ever carries an unbounded array — the property the dedup
  * family's exchanges already enforce (skinny-row co-counting), extended
  * back into the scan itself. An "array-free" dedup pipeline
  * (`dedup_prefix_filter`) runs entirely on its output.
  *
  * Tokenization is [[WordShingles.shingleStrings]] — the single source
  * of tokenizer truth shared with the `word_shingles` Expression and the
  * `SimilarityJoinExec` physical operator — so the three can never
  * drift; `ShingleExplodeSpec` pins row-set equality against the
  * composed explode form. Distinctness needs a per-document seen-set
  * either way, so peak memory matches the array form; what disappears
  * is the array VALUE in the intermediate schema.
  */
case class ShingleExplode(text: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def elementSchema: StructType =
    new StructType().add("sh", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_explode needs a STRING text argument, got ${text.dataType.sql}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure("shingle_explode needs a literal INT n")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val nVal: Int =
    n.eval(InternalRow.empty).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Iterator.empty
    else
      WordShingles
        .shingleStrings(t.asInstanceOf[UTF8String], nVal)
        .iterator
        .map(s => InternalRow(UTF8String.fromString(s)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleExplode =
    copy(text = newChildren(0), n = newChildren(1))

  override def prettyName: String = "shingle_explode"
}
