package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native aggregate for the centroid hot path. Elementwise means over
  * 64-dim vectors used to be expressed as 64 SEPARATE aggregate columns
  * (`array((0 until 64).map(i => fixedPointMean(element_at(...))))`) —
  * semantically fine, but each such groupBy generates a 64-wide
  * aggregation schema whose generated class takes seconds of janino
  * compile time, and k-means needs three of them. This aggregate keeps
  * the whole vector in ONE column: the buffer is a primitive long array,
  * update is a tight loop, and partial+final merge is elementwise adds —
  * exactly the map-side-combine shape a 100 TB centroid pass needs.
  *
  * Arithmetic is bit-identical to the column-per-dim form (SURVEY §2
  * determinism rules): each element is quantized by the exact
  * power-of-two scale 2^24 (`floor(x * 2^24)` as a long), summed as
  * integers — order-independent — and divided back by the caller.
  */
object VectorAggregates {

  /** Elementwise Σ floor(v[i] · 2²⁴) over array<double> rows → array<long>. */
  def vecFixedSum(a: Column): Column =
    ColumnBridge.column(
      VectorFixedPointSum(ColumnBridge.expression(a)).toAggregateExpression())
}

case class VectorFixedPointSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  private val Scale = 16777216.0 // 2^24 — exact exponent shift

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_fixed_sum"

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // fail FAST on ragged vectors: silently zero-padding a short row
    // would deflate the tail dims of every mean computed as sum/count
    // (and diverge from the oracle, whose per-dim indexing NULLs out
    // instead) — a length mismatch is data corruption, not a shape to
    // absorb. The empty buffer (first row on this partition) fixes the
    // dimensionality.
    if (buf.length != 0 && n != buf.length)
      throw new IllegalArgumentException(
        s"$prettyName: ragged vector — got $n dims, group has ${buf.length}")
    val b = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) b(i) += math.floor(arr.getDouble(i) * Scale).toLong
      i += 1
    }
    b
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // empty = a partition that saw no rows; two non-empty buffers of
    // different lengths mean ragged input slipped past update (never
    // reachable, but corruption must not merge silently)
    if (b1.length != 0 && b2.length != 0 && b1.length != b2.length)
      throw new IllegalArgumentException(
        s"$prettyName: merging buffers of ${b1.length} and ${b2.length} dims")
    val (big, small) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = LongArraySerde.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = LongArraySerde.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorFixedPointSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorFixedPointSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorFixedPointSum =
    copy(child = newChild)
}
