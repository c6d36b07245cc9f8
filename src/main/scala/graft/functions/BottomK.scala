package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k (sortKey, payload) aggregate — the sampling /
  * top-k primitive that replaces a global window sort. The standard
  * way to take "k rows per group by some order" is
  * `row_number() OVER (PARTITION BY g ORDER BY s) <= k`, which
  * shuffles EVERY row to its group's partition and sorts all of them
  * — at 100 TB that is a full-data shuffle for a k-row answer. This
  * aggregate keeps only the k smallest (key, payload) pairs in an
  * O(k) buffer: map-side partial aggregation reduces each input
  * partition to ≤ k pairs per group BEFORE the exchange, so the
  * shuffle carries ≤ k·partitions rows per group and the merge is an
  * O(k) sorted-array merge. With `key = md5(id)` the k smallest
  * hashes are a uniform random k-sample per group — a deterministic,
  * mergeable, cross-engine-reproducible reservoir sample (a09).
  *
  * Pairs are totally ordered by (key, payload) — payload is the
  * tiebreak, so the result is deterministic even under key
  * collisions. NULL keys/payloads are ignored. Output: the sorted
  * ascending `array<struct<k bigint, v bigint>>` (length ≤ k).
  */
case class BottomK(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"bottom_k needs k > 0: $k")

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](math.min(k, 16))

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  // sorted-insert keeping the k smallest pairs (duplicates kept —
  // inputs are rows, each contributes once)
  private def insert(buf: ArrayBuffer[(Long, Long)], p: (Long, Long)): Unit = {
    if (buf.length == k && !lt(p, buf(buf.length - 1))) return
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(mid), p)) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, p)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val kv = left.eval(input)
    val pv = right.eval(input)
    if (kv != null && pv != null) {
      insert(buf, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Long, Long)], b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    // both sorted: O(k) merge, stop once k collected
    val out = new ArrayBuffer[(Long, Long)](math.min(k, b1.length + b2.length))
    var i = 0
    var j = 0
    while (out.length < k && (i < b1.length || j < b2.length)) {
      if (j >= b2.length || (i < b1.length && lt(b1(i), b2(j)))) {
        out += b1(i); i += 1
      } else {
        out += b2(j); j += 1
      }
    }
    out
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map { case (kv, pv) =>
      new GenericInternalRow(Array[Any](kv, pv))
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k takes (BIGINT key, BIGINT payload), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BottomK =
    copy(left = newLeft, right = newRight)
}
