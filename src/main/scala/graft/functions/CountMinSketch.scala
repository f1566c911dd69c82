package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count–min sketch as a native Catalyst `TypedImperativeAggregate` — the
  * mergeable-sketch surface (B7 approximate aggregation / B14 custom
  * aggregate): a `depth × width` counter matrix where row `r` increments
  * bucket `h_r(x)`; the frequency estimate for a key is the MIN of its
  * `depth` counters (over-count only, never under). Generalizes the
  * reference's single-value word count (`Assignment1/server.c:179-252`) to
  * a fixed-size frequency summary of an unbounded keyspace.
  *
  * Scale design:
  *  - the buffer is a flat `Array[Long](depth·width)` — partial sketches
  *    build map-side and MERGE by elementwise add (the whole point of a
  *    linear sketch: executor-local partials, one `depth·width·8`-byte
  *    row per partition to the final combine, regardless of corpus size);
  *  - bucket indices are computed OUTSIDE the aggregate by codegen'd
  *    built-ins (`pmod(hash60(…), width)`, [[PortableHash]]) so the
  *    update path stays whole-stage-friendly and the hash family is
  *    engine-portable — DuckDB reproduces every counter cell, so the
  *    estimates are oracled bit-for-bit (no "within ε" hand-waving);
  *  - serialization is the raw long array (no boxing).
  *
  * Input: `array<long>` of `depth` bucket indices for one item.
  * Output: `array<long>` of length `depth · width` (row-major counters).
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && width >= 1 && depth.toLong * width <= (1 << 24),
    s"unreasonable sketch size: $depth x $width")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[ArrayData]
      var r = 0
      while (r < depth) {
        val b = idx.getLong(r)
        // an out-of-range bucket is a caller bug; guard rather than corrupt
        if (b >= 0 && b < width) buffer(r * width + b.toInt) += 1L
        r += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CountMinSketch {
  /** Bucket index columns for a string key: `h_r = hash60("cms:r:" ++ key)
    * mod width`, one per sketch row — the portable spelling shared with
    * the DuckDB oracle ([[bucketSql]]). */
  def buckets(key: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.functions.array((0 until depth).map { r =>
      org.apache.spark.sql.functions.pmod(
        PortableHash.hash60(org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit(s"cms:$r:"), key)),
        org.apache.spark.sql.functions.lit(width.toLong))
    }: _*)

  /** The aggregate column: a row-major `depth × width` counter array. */
  def sketch(bucketIdx: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(bucketIdx), depth, width)
        .toAggregateExpression())

  /** DuckDB spelling of the bucket index of SQL expression `e` in row `r`. */
  def bucketSql(e: String, r: String, width: Int): String =
    s"${PortableHash.sql(s"'cms:' || $r || ':' || $e")} % $width"
}
