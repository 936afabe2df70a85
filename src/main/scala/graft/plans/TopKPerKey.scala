package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY §2.7 O3 generalized —
  * the warehouse's "quality DESC / date DESC per business" read pattern).
  *
  * Spark expresses per-key top-k as window row_number + filter, which
  * SORTS every partition group (O(n log n) per key, full-width rows
  * through the sort). This operator instead keeps a bounded heap per key:
  *
  *   partial phase (no distribution requirement): each input partition
  *     reduces to <= k rows per locally-seen key — the map-side combine;
  *   final phase (ClusteredDistribution(keys) — EnsureRequirements inserts
  *     ONE hash exchange): merges the partial winners per key.
  *
  * At 100 TB the shuffle carries <= k rows per (key, partition) instead of
  * every row, and nothing is globally sorted. Semantics = the first k rows
  * of each key under `order` (make the order total — e.g. tiebreak on a
  * unique column — for deterministic output).
  *
  * Demonstrates the full custom-operator tier: LogicalPlan node + planner
  * Strategy + physical UnaryExecNode, injected via GraftExtensions.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKey = copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap wrt the sort order: head = worst kept row per key
      val heaps = new java.util.HashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = scala.collection.mutable.PriorityQueue
            .empty[UnsafeRow](rowOrd.asInstanceOf[Ordering[UnsafeRow]])
          heaps.put(key.copy(), q)
        }
        if (q.size < limit) q.enqueue(row.copy().asInstanceOf[UnsafeRow])
        else if (rowOrd.compare(row, q.head) < 0) {
          q.dequeue()
          q.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && it.hasNext)
            // dequeueAll yields ascending under the queue's (max-heap)
            // ordering reversed — emit best-first per key
            current = it.next().dequeueAll.reverseIterator
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

object TopK {
  /** Sort spec: column name + direction (desc=true). Built into resolved
    * catalyst SortOrders directly (Column sort nodes stay unresolved inside
    * custom plan nodes), with Spark's default null ordering (asc -> nulls
    * first, desc -> nulls last — matching window-function sorts).
    */
  final case class Sort(column: String, desc: Boolean = false)
  def asc(c: String): Sort = Sort(c)
  def desc(c: String): Sort = Sort(c, desc = true)

  /** First `k` rows per `keyCols` group under `sortSpec` (make the order
    * total — e.g. tiebreak on a unique column — for determinism).
    */
  def perKey(df: DataFrame, keyCols: Seq[String], sortSpec: Seq[Sort],
             k: Int): DataFrame = {
    // self-register the strategy so the operator works in sessions created
    // without spark.sql.extensions=graft.rules.GraftExtensions
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKPerKeyStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKPerKeyStrategy
    val keys = keyCols.map(c => GraftBridge.expression(df(c)))
    val order = sortSpec.map { s =>
      SortOrder(GraftBridge.expression(df(s.column)),
        if (s.desc) Descending else Ascending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKey(keys, order, k, GraftBridge.analyzedPlan(df)))
  }
}
