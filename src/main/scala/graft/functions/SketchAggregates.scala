package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sketch aggregates (SURVEY §2C/§2D "novel sketch" slot). The KMV
  * (k-minimum-values) distinct sketch keeps the k smallest DISTINCT
  * 48-bit hashes of a key column; `(k-1) / max_kth` (normalized)
  * estimates the distinct count. The aggregation state is a BOUNDED
  * sorted array — k longs, never more — so unlike
  * `collect_set`/window-rank formulations the memory per group is
  * constant regardless of input size, and partial+final merge is a
  * sorted-array merge: exactly the sketch contract that lets a 100 TB
  * distinct-count run entirely map-side-combined. Deterministic and
  * order-independent (a set's k smallest members don't depend on
  * arrival order), so the DuckDB oracle reproduces it exactly with
  * DISTINCT + row_number ≤ k.
  */
object SketchAggregates {

  /** k smallest distinct values of a long column, as a sorted array<long>. */
  def minKDistinct(a: Column, k: Int): Column =
    ColumnBridge.column(
      MinKDistinctLongs(ColumnBridge.expression(a), k).toAggregateExpression())

  /** MinHash signature: per permutation i, min((v·aᵢ + bᵢ) mod p) over the
    * group's hash values — ONE array-typed aggregate instead of numPerms
    * separate min columns (whose generated aggregation class grows with
    * the signature length). Same arithmetic, same values. */
  def minhashSig(v: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(v), a.toArray, b.toArray, p)
        .toAggregateExpression())
}

case class MinHashSignature(
    child: Expression,
    a: Array[Long],
    b: Array[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(a.length == b.length, "permutation coefficient arrays must align")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(a.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < buf.length) {
        val h = (x * a(i) + b(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.length > 0 && buf(0) == Long.MaxValue) null // no input rows contributed
    else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

case class MinKDistinctLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_min_k_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(buf: java.util.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.remove(buf.last); () } }
  }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[Long], b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.isEmpty) null
    else {
      val out = new Array[Long](buf.size)
      var i = 0
      val it = buf.iterator()
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val buf = new java.util.TreeSet[Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKDistinctLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKDistinctLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKDistinctLongs =
    copy(child = newChild)
}
