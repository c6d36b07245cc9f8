package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002) as
  * a native bounded aggregate: the buffer holds the k smallest
  * DISTINCT hash values seen — O(k) memory per group no matter how
  * many rows flow through, map-side partial aggregation combines
  * sketches with an O(k) sorted merge, and the union of two sketches
  * is the sketch of the union (mergeable, like every production
  * sketch at 100 TB). The estimator over a uniform hash space of size
  * `2^B`: fewer than k distinct hashes → the sketch IS the exact
  * distinct set; otherwise `(k−1) · 2^B / h_(k)` (h_(k) = the k-th
  * smallest hash).
  *
  * Unlike HLL (whose register layout is engine-private), KMV over an
  * md5-derived hash is CROSS-ENGINE REPRODUCIBLE — the DuckDB oracle
  * recomputes the identical sketch and estimate from the same hashes
  * (SURVEY §4: md5 is the shared primitive), so the a05 gate checks
  * the estimate exactly, not within a tolerance band.
  *
  * Hashes must be non-negative (use ≤ 15 hex chars of md5 → 60 bits);
  * NULLs are ignored. Output = the sorted ascending hash array
  * (length ≤ k) — estimation happens in the query, keeping the
  * aggregate a pure mergeable sketch (storable, unionable later, the
  * sketch-persistence pattern).
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] with UnaryLike[Expression] {

  require(k > 1, s"k_min_values needs k > 1: $k")

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long](math.min(k, 16))

  // sorted-insert keeping the k smallest distinct values
  private def insert(buf: ArrayBuffer[Long], v: Long): Unit = {
    if (buf.length == k && v >= buf(buf.length - 1)) return
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == v) return // distinct only
    buf.insert(lo, v)
    if (buf.length > k) buf.remove(buf.length - 1)
  }

  override def update(buf: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < b2.length) { insert(b1, b2(i)); i += 1 }
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
  override def prettyName: String = "k_min_values"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"k_min_values hashes BIGINT values, got ${child.dataType.sql}")
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}
