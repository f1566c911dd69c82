package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating function (UDTF / Catalyst `Generator`): emits
  * one row per word n-gram of a token array — the B14 generator surface,
  * completing the extension trio (UDF / UDAF / UDTF) with a native
  * `Generate`-planned expression rather than an explode-over-transform
  * composition.
  *
  * Generalizes the reference's word-count external exec
  * (`Assignment1/server.c:179-252`) to order-sensitive n-gram emission.
  * Planned through the same `Generate` physical operator as `explode`, so
  * rows stream out without materializing the n-gram array per document —
  * at 100 TB that is one fewer array allocation per row in the scan
  * projection.
  */
case class NGramsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) Iterator.empty
    else {
      val arr = data.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n) Iterator.empty
      else (0 to m - n).iterator.flatMap { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        var hasNull = false
        while (j < n && !hasNull) {
          val tok = arr.getUTF8String(i + j)
          if (tok == null) hasNull = true
          else {
            if (j > 0) sb.append(' ')
            sb.append(tok.toString)
          }
          j += 1
        }
        // Windows containing a null token are skipped (elementSchema
        // declares ngram non-nullable) rather than NPE-ing the task.
        if (hasNull) Iterator.empty
        else Iterator(InternalRow(UTF8String.fromString(sb.toString)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramsGen {
  /** Column-API entry point: `ngrams(tokens, 3)` → generator column. */
  def ngrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(NGramsGen(ColumnBridge.expression(tokens), n))

  /** The ONE SQL builder (shared by the session registry and
    * GraftExtensions): n must be a foldable integral literal — Int and
    * Long spellings (`3`, `CAST(3 AS BIGINT)`) both accepted. */
  val sqlBuilder: Seq[Expression] => Expression = {
    case Seq(tokens, nExpr) if nExpr.foldable =>
      val n = nExpr.eval(null) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long    => l.intValue
        case s: java.lang.Short   => s.intValue
        case other => throw new IllegalArgumentException(
          s"ngrams_gen: n must be an integer literal, got $other")
      }
      NGramsGen(tokens, n)
    case other => throw new IllegalArgumentException(
      s"ngrams_gen expects (array, <integer literal>), got ${other.size} args" +
        (if (other.size == 2) " with non-foldable n" else ""))
  }

  /** Make `ngrams_gen(tokens, n)` usable from SQL (incl. LATERAL VIEW). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, "ngrams_gen", sqlBuilder)
}
