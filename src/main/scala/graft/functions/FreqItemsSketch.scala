package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving frequent-items sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT'05)
  * as a Catalyst `TypedImperativeAggregate` — the third aggregate surface
  * the library exercises (declarative: [[ExactMoneySum]]; typed
  * `Aggregator`: [[SalesAgg]]; and this, the serialized-binary-buffer
  * form that sketch libraries integrate through).
  *
  * The buffer tracks at most `capacity` items as (estimate, error)
  * counters. Per-partition sketches merge with the parallel Space-Saving
  * bound: a key absent from a FULL buffer has true count ≤ that buffer's
  * minimum estimate, so the merge adds that floor to both the estimate
  * and the error of one-sided keys, then re-trims to capacity keeping the
  * largest estimates. Two invariants survive any partitioning / merge
  * order (asserted against exact counts in `SketchSpec`):
  *
  *  - `est − err ≤ true ≤ est` for every reported item;
  *  - every item with true count > Σ_p n_p/capacity (= n/capacity
  *    overall) is present in the merged sketch.
  *
  * Scale posture: the shuffle carries one `capacity`-bounded binary
  * buffer per partition instead of one row per distinct item — the
  * mergeable-sketch shape that replaces a full groupBy-count at 100 TB
  * (same story as the HLL / GK rows in `COVERAGE.md`). Eviction scans
  * are O(capacity) per absent-key update; a production variant would add
  * the min-heap ("stream-summary") structure, which changes nothing
  * about the plan shape.
  *
  * Determinism: eviction and trim tie-breaks order by (count, err, item)
  * so a fixed partition layout reproduces bit-identical sketches.
  */
case class FreqItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && capacity > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_items_sketch needs a STRING column and a positive capacity, " +
        s"got ${child.dataType.sql} / $capacity")

  type Buf = mutable.HashMap[String, (Long, Long)]

  override def createAggregationBuffer(): Buf = mutable.HashMap.empty

  /** Smallest tracked counter under the deterministic total order. */
  private def minEntry(m: Buf): (String, (Long, Long)) =
    m.minBy { case (k, (c, e)) => (c, e, k) }

  override def update(m: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      m.get(item) match {
        case Some((c, e)) => m.update(item, (c + 1, e))
        case None if m.size < capacity => m.update(item, (1L, 0L))
        case None =>
          val (mk, (mc, _)) = minEntry(m)
          m.remove(mk)
          // the evicted counter's estimate becomes the newcomer's error
          m.update(item, (mc + 1, mc))
      }
    }
    m
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // absent-key floor: only a FULL buffer bounds its unseen items
    val floorA = if (a.size >= capacity) a.values.iterator.map(_._1).min else 0L
    val floorB = if (b.size >= capacity) b.values.iterator.map(_._1).min else 0L
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (a.keysIterator ++ b.keysIterator).foreach { k =>
      if (!merged.contains(k)) {
        val (ca, ea) = a.getOrElse(k, (floorA, floorA))
        val (cb, eb) = b.getOrElse(k, (floorB, floorB))
        merged.update(k, (ca + cb, ea + eb))
      }
    }
    if (merged.size <= capacity) merged
    else {
      // keep the largest estimates; kept-min ≥ dropped-max preserves the
      // absent-key bound for any later merge
      val kept = merged.toSeq
        .sortBy { case (k, (c, e)) => (-c, e, k) }
        .take(capacity)
      mutable.HashMap(kept: _*)
    }
  }

  override def eval(m: Buf): Any = {
    val rows = m.toSeq
      .sortBy { case (k, (c, e)) => (-c, e, k) }
      .map { case (k, (c, e)) =>
        InternalRow(UTF8String.fromString(k), c, e)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(m: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (k, (c, e)) =>
      out.writeUTF(k); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val k = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      m.update(k, (c, e))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_items_sketch"
}
