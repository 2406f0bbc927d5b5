package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as one
  * `TypedImperativeAggregate`: state is the set of the k smallest DISTINCT
  * hash values seen; the estimator is the classic
  * `(k-1) / h_(k)`-normalized form — here over a 60-bit hash domain, so
  * `est = floor((k-1)·2⁶⁰ / h_(k))`, computed in exact BigInt arithmetic.
  * With fewer than k distinct hashes the sketch IS the exact count.
  *
  * Why this sketch (and not approx_count_distinct): the state is MERGEABLE
  * (union + keep k smallest — the map-side combine a 1000-executor count
  * needs, k·8 bytes per group), and given a shared hash function the
  * estimate is fully DETERMINISTIC — bit-identical across engines, so a
  * DuckDB oracle replaying the same md5-prefix hash reproduces it exactly
  * (Spark's HLL++ sketch is neither portable nor replayable). Estimation
  * error is the standard ~1/√(k−2) relative band, chosen by k.
  *
  * Input contract: `child` must evaluate to NON-NEGATIVE longs below 2⁶⁰
  * (the md5-prefix-15-hex-chars hash both engines share). Nulls ignored.
  */
case class KMVAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 2, "KMV needs k >= 2")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else ((BigInt(k - 1) << 60) / BigInt(buf.last().longValue())).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMVAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMVAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMVAgg =
    copy(child = newChild)
}

object KMVAgg {
  /** Column API: `kmv(hashCol, k)` → long distinct-count estimate. */
  def apply(h: Column, k: Int): Column =
    ColumnBridge.column(
      KMVAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}

/** The KMV sketch SET itself (sorted array of the k smallest distinct
  * hashes) — the composable form: two sketch sets support theta-style set
  * operations (union = merge; intersection estimate = matching hashes below
  * the smaller sketch's threshold, rescaled). Same state/merge as
  * [[KMVAgg]]; only eval differs. */
case class KMVSetAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 2, "KMV needs k >= 2")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMVSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMVSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMVSetAgg =
    copy(child = newChild)
}

object KMVSetAgg {
  /** Column API: `kmvSet(hashCol, k)` → sorted array<long> sketch set. */
  def apply(h: Column, k: Int): Column =
    ColumnBridge.column(
      KMVSetAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}
