package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Both members of the portable md5 hash family from ONE digest:
  * `phash_pair(s) = [h1, h2]` where
  *
  *  - `h1` ≡ `CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)`
  *    (the top 60 digest bits — [[graft.Exprs.phash]]),
  *  - `h2` ≡ `pmod(CAST(conv(substring(md5(s),16,14),16,10) AS BIGINT), 2^55)`
  *    (digest bits 60..115 masked to 55 — the second, independent
  *    Kirsch-Mitzenmacher hash).
  *
  * The composed built-in form runs the md5 TWICE per value and round-trips
  * each through hex formatting and string parsing; this expression reads
  * the digest bytes directly — same bits, one digest, no hex. It exists
  * for the minhash hot path, where the pair is evaluated once per
  * (document, shingle): the double-hashed family `g_i = h1 + i·h2` needs
  * both halves for every shingle of the corpus. Bit-equivalence to the
  * built-in chain is pinned in `PHashPairSpec` (interpreted AND codegen),
  * and the DuckDB oracles keep replaying the hex form — proving the
  * byte-path rewrite preserves the family exactly.
  *
  * Output is `ARRAY<BIGINT>` (2 elements), not a struct: both consumers
  * immediately project the two halves, and array `getItem` keeps the
  * fused evaluation inside one codegen span with subexpression
  * elimination deduplicating the digest.
  */
case class PHashPair(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"phash_pair needs a STRING argument, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    PHashPair.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = PHashPair.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = $helper.compute(${childGen.value});
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): PHashPair =
    copy(child = newChild)

  override def prettyName: String = "phash_pair"
}

object PHashPair {
  private val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** (h1, h2) from the digest bytes — shared by interpreted eval,
    * generated code, and the RDD-side [[graft.plans.SimilarityJoin]]. */
  def computeLongs(bytes: Array[Byte]): (Long, Long) = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(bytes)
    val hi = java.nio.ByteBuffer.wrap(d, 0, 8).getLong
    val lo = java.nio.ByteBuffer.wrap(d, 8, 8).getLong
    val h1 = hi >>> 4
    val h2 = (((hi & 0xFL) << 52) | (lo >>> 12)) & ((1L << 55) - 1)
    (h1, h2)
  }

  def compute(s: UTF8String): GenericArrayData = {
    val (h1, h2) = computeLongs(s.getBytes)
    new GenericArrayData(Array[Any](h1, h2))
  }
}
