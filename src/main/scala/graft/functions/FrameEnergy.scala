package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Per-frame signal energy over a BINARY payload: the payload is cut
  * into fixed-length frames (the last one possibly short) and each
  * frame reports Σ (byte − 128)², the energy of 8-bit-centered PCM —
  * the windowed feature an audio pipeline computes before VAD /
  * silence trimming. One pass over the raw bytes inside
  * WholeStageCodegen (same design as [[NibbleHistogram]]: the decode
  * stays a stub in this container, byte-level features are the honest
  * codec-free path). Integer arithmetic only — a frame's energy is
  * ≤ len·128², exact in INT64 — so the DuckDB twin, which parses hex
  * pairs, matches bit-for-bit.
  */
case class FrameEnergy(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"frame_energy needs a BINARY payload, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "frame_energy needs a literal INT frame length")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(payload: Any, frameLen: Any): Any =
    FrameEnergy.energies(
      payload.asInstanceOf[Array[Byte]], frameLen.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, n) =>
      s"graft.functions.FrameEnergy$$.MODULE$$.energies($p, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FrameEnergy =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "frame_energy"
}

object FrameEnergy {
  /** Shared by interpreted eval and generated code. */
  def energies(bytes: Array[Byte], frameLen: Int): ArrayData = {
    require(frameLen > 0, "frame length must be positive")
    val n = (bytes.length + frameLen - 1) / frameLen
    val out = new Array[Long](n)
    var i = 0
    while (i < bytes.length) {
      val d = (bytes(i) & 0xff) - 128
      out(i / frameLen) += (d * d).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
