package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `collect_list` with a HARD buffer cap — the aggregation primitive
  * that makes inverted-index dedup safe at 100 TB. A plain
  * collect_list over (source, gram) groups materializes a
  * hyper-frequent shingle's entire doc list (millions of ids) in one
  * aggregation buffer before any df-filter can drop it; the two-pass
  * df-count + semi-join shape avoids that but re-explodes every
  * document's grams twice. This aggregate does it in ONE pass with a
  * buffer that physically cannot exceed `cap` elements: updates and
  * merges stop appending at the cap, so an over-df group simply
  * surfaces as a `cap`-length list for the caller to filter out
  * (cap = df-threshold + 1 ⇒ `size(col) <= threshold` keeps exactly
  * the groups a df-prune would keep — order-independent, since a
  * group at or under the threshold is collected in full).
  *
  * Long-typed (collects ids); deterministic output only up to element
  * order, like collect_list itself.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  require(cap > 0, s"collect_capped cap must be positive: $cap")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(cap, 16))

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      if (v != null) buf += v.asInstanceOf[Long]
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (b1.length < cap && i < b2.length) {
      b1 += b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_capped"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"collect_capped collects BIGINT ids, got ${child.dataType.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

