package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Adaptive mergeable quantile sketch — a deterministic bottom-k (KMV)
  * sample as a native Catalyst `TypedImperativeAggregate`. Fills the gap
  * the fixed-boundary histogram state (`q_agg_quantile_state`) leaves
  * open: that state presumes the value domain is known up front (a
  * drifting metric walks off the bucket grid), while this sketch keeps the
  * k input pairs with the SMALLEST portable hash — a uniform sample of the
  * rows that adapts to ANY value distribution with no configured bounds,
  * from which any quantile is read as an exact rank of the sample.
  *
  * Why bottom-k instead of KLL/t-digest: those sketches are randomized
  * (KLL) or summation-order-sensitive (t-digest centroids), so their
  * output depends on partition order and cannot be hash-compared against
  * an oracle. Bottom-k over a deterministic hash is ORDER-FREE — the
  * sample is a pure function of the input multiset:
  *
  *  - **Closure under merge** (the KMV property): bottom-k(bottom-k(A) ∪
  *    bottom-k(B)) = bottom-k(A ∪ B), so partial sketches merge without
  *    error accumulation — merge(partials) is bit-identical to one full
  *    pass, which the oracled query proves by computing BOTH paths.
  *  - **Portable determinism**: the rank key is `hash60("qsk:" ++ uid)`
  *    ([[PortableHash]], computed OUTSIDE the aggregate by codegen'd
  *    built-ins — the [[CountMinSketch]] discipline), ties broken by
  *    value, so DuckDB reproduces the exact sample with one ROW_NUMBER.
  *  - **Scale shape**: the buffer is a bounded k-pair heap (k·16 bytes);
  *    partials build map-side and ship k pairs per partition regardless
  *    of corpus size; estimate error is the standard uniform-sampling
  *    bound O(1/√k) per quantile.
  *
  * Input: `array<long>` `[h, v]` (hash key, value). Output:
  * `array<array<long>>` — the sample pairs sorted ascending by (h, v),
  * directly re-feedable to a second sketch pass (how partial outputs
  * merge: explode + re-aggregate).
  */
case class BottomKQuantileAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]] {

  require(k >= 1 && k <= (1 << 20), s"unreasonable sample size: $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  /** Max-first on (h, v): peek() is the pair to evict when a smaller one
    * arrives. Deterministic total order — no hash-collision ambiguity. */
  private def cmp: java.util.Comparator[Array[Long]] =
    (a: Array[Long], b: Array[Long]) => {
      val c = java.lang.Long.compare(b(0), a(0))
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](k, cmp)

  private def insert(buf: java.util.PriorityQueue[Array[Long]], h: Long, v: Long): Unit =
    if (buf.size < k) buf.add(Array(h, v))
    else {
      val top = buf.peek()
      if (h < top(0) || (h == top(0) && v < top(1))) {
        buf.poll(); buf.add(Array(h, v))
      }
    }

  override def update(buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val p = child.eval(input)
    if (p != null) {
      val a = p.asInstanceOf[ArrayData]
      insert(buf, a.getLong(0), a.getLong(1))
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[Array[Long]],
      other: java.util.PriorityQueue[Array[Long]]): java.util.PriorityQueue[Array[Long]] = {
    val it = other.iterator()
    while (it.hasNext) { val p = it.next(); insert(buf, p(0), p(1)) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val arr = buf.toArray(new Array[Array[Long]](buf.size))
    java.util.Arrays.sort(arr, cmp.reversed())
    new GenericArrayData(arr.map(p => new GenericArrayData(p): Any))
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) insert(buf, bb.getLong(), bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object QuantileSketch {
  import org.apache.spark.sql.functions._

  /** The (hash, value) input pair: rank key = `hash60("qsk:" ++ uid)` —
    * the portable spelling shared with the DuckDB oracle ([[hashSql]]). */
  def pair(uid: Column, value: Column): Column =
    array(PortableHash.hash60(concat(lit("qsk:"), uid.cast("string"))),
      value.cast("long"))

  /** The aggregate column over [[pair]]s: the bottom-k sample, sorted. */
  def sketch(hv: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKQuantileAgg(ColumnBridge.expression(hv), k).toAggregateExpression())

  /** Quantile `num/den` read from a sketch output: the sample value at
    * nearest-rank ceil(num·m/den) — pure integer arithmetic (no double
    * p·m whose rounding could diverge across engines). */
  def quantile(sample: Column, num: Int, den: Int): Column = {
    val values = array_sort(transform(sample, p => element_at(p, 2)))
    val m = size(values).cast("long")
    element_at(values, ((lit(num.toLong) * m + lit(den.toLong - 1)) / den).cast("int"))
  }

  /** DuckDB spelling of the rank hash of SQL expression `uid`. */
  def hashSql(uid: String): String = PortableHash.sql(s"'qsk:' || $uid")
}
