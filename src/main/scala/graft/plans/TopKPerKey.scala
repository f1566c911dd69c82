package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge

/** Custom whole-operator extension (SURVEY §2 B14 path (c)): a
  * `TopKPerKey` LogicalPlan node, planned by a `SparkStrategy` into a
  * two-phase physical operator.
  *
  * Why a custom operator: the built-in formulation of "top k rows per key"
  * is `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which
  * shuffles and SORTS every input row. This operator keeps a bounded
  * heap of k rows per key: the partial phase runs before the exchange, so
  * only ≤ k·|keys| rows per partition are shuffled — at 100 TB, rank
  * pruning happens map-side, which is the difference between shuffling the
  * table and shuffling the answer.
  *
  * Phases: `partial=true` exec (any distribution) → EnsureRequirements
  * inserts a hash exchange on the keys (from `requiredChildDistribution`)
  * → `partial=false` exec merges per-key heaps to the final top-k.
  * Memory per task is O(distinct keys in partition × k rows).
  */
case class TopKPerKeyNode(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // heap head = the row that sorts LAST among the kept k (evict target)
      val evictFirst = new java.util.Comparator[InternalRow] {
        def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val perKey = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = perKey.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, evictFirst)
          perKey.put(key.copy(), pq)
        }
        if (pq.size < kLocal) pq.add(row.copy())
        else if (ord.compare(row, pq.peek()) < 0) { pq.poll(); pq.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      perKey.values().asScala.iterator.flatMap(_.iterator().asScala)
    }
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top `k` rows per key group. `order` entries are (columnName, desc?).
    * Expressions are resolved directly against the child's analyzed output
    * (lazy Column wrappers don't survive into a custom physical plan).
    * Installs the strategy on the session (idempotent). */
  def perKey(df: DataFrame, k: Int, keys: Seq[String], order: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = ColumnBridge.analyzedPlan(df)
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name)}"))
    val keyExprs = keys.map(attr)
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerKeyNode(k, keyExprs, sortOrder, child))
  }
}
