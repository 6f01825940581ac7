package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.FrameEnergy]] semantics: frame math on planted
  * byte patterns, the short last frame, the empty payload, and
  * codegen/interpreted agreement.
  */
class FrameEnergySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def energies(payload: Array[Byte], frameLen: Int): Seq[Long] =
    Seq(Tuple1(payload)).toDF("p")
      .select(call_function("frame_energy", col("p"), lit(frameLen)).as("e"))
      .collect().head.getSeq[Long](0)

  test("planted frames: constant bytes give len*(b-128)^2 per frame") {
    val payload = Array.fill[Byte](512)(0x90.toByte) // 0x90=144, d=16
    assert(energies(payload, 256) == Seq(256L * 256, 256L * 256))
  }

  test("short last frame sums only its own bytes") {
    val payload = Array.fill[Byte](300)(0x80.toByte) ++ Array[Byte](0, 0)
    // 0x80 contributes 0; the two 0x00 bytes land in frame 1: 2*128^2
    assert(energies(payload, 256) == Seq(0L, 2L * 128 * 128))
  }

  test("empty payload yields an empty frame array") {
    assert(energies(Array.emptyByteArray, 256).isEmpty)
  }

  test("interpreted eval matches the DataFrame (codegen) path") {
    val payload = (0 until 1000).map(i => (i * 31 % 256).toByte).toArray
    val interp = functions.FrameEnergy.energies(payload, 256)
    val viaDf = energies(payload, 256)
    assert((0 until interp.numElements())
      .map(interp.getLong).toSeq == viaDf)
  }
}
