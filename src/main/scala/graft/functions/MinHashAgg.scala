package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash components in ONE aggregate: state is a packed `Array[Long]`
  * of running minima, updated with a tight loop of splitmix64 re-hashes per
  * input shingle hash.
  *
  * Replaces k separate `min(xxhash64(h, seed+i))` aggregate expressions: the
  * hash-aggregate state shrinks from k independent agg buffers to one array,
  * and the per-row work is one function call instead of k expression
  * evaluations. Same candidate-generation quality (splitmix64 is a bijective
  * 64-bit finalizer, so each lane is an independent uniform hash family), and
  * downstream LSH banding + exact-Jaccard verification are unchanged.
  */
case class MinHashAgg(child: Expression, k: Int, seed: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val m = MinHashAgg.mix(h + (seed + i) * MinHashAgg.GOLDEN)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    if (buf.forall(_ == Long.MaxValue)) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  private[functions] final val GOLDEN = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer: bijective 64-bit mix. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column API: `minhash(hashCol, k, seed)` → array<long> of k minima. */
  def apply(h: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(h), k, seed).toAggregateExpression())
}

/** MAP-SIDE MinHash: the full k-lane signature of a per-document shingle-hash
  * ARRAY, as a scalar expression — no aggregation, no shuffle. Identical lane
  * definition to [[MinHashAgg]] (splitmix64 over h + (seed+i)·GOLDEN), so the
  * two are interchangeable; this one pairs with a map-side-built distinct
  * gram array, turning signature computation into a pure projection.
  * Per-row cost is k·|hs| mixes (~10⁴ for typical docs) — the CodegenFallback
  * eval is noise next to that loop. Empty arrays yield null (no shingles). */
case class MinHashSig(child: Expression, k: Int, seed: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val buf = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val m = MinHashAgg.mix(h + (seed + i) * MinHashAgg.GOLDEN)
        if (m < buf(i)) buf(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: `minhashSig(hsArrayCol, k, seed)` → array<long> of k minima. */
  def apply(hs: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), k, seed))
}

/** MAP-SIDE SimHash: the `bits`-bit signature of a token-hash ARRAY as a
  * scalar expression — one tight ±1-per-bit accumulation loop per document,
  * no explode, no 60-sum groupBy, no shuffle. Token multiplicity is
  * preserved (the array is NOT deduplicated), matching the aggregate
  * formulation and the DuckDB oracle exactly: bit i of the result is set
  * iff Σ_tokens (±1 by bit i of token hash) > 0. */
case class SimHashSig(child: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  /** Column API: `simhashSig(tokenHashArrayCol, bits)` → long signature. */
  def apply(hs: Column, bits: Int): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(hs), bits))
}

/** |A ∩ B| of two SORTED array<long> columns by a single merge scan — no
  * hash-set build, no result-array allocation (Spark's array_intersect pays
  * both per call). The dedup verifiers evaluate this once per candidate
  * pair, so the per-call constant is the whole cost. Inputs MUST be sorted
  * ascending (the map-side gram projections sort once per document). */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var (i, j) = (0, 0)
    var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
