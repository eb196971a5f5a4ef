package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.SqlBridge

/** Whole-operator extension (SURVEY.md §2 custom-operator preference
  * order (c)): per-key top-k as a custom LogicalPlan + SparkStrategy +
  * physical operator, the full Catalyst extension surface beyond a
  * scalar Expression (cosine_sim) or a typed Aggregator (TopKByPrice).
  *
  * Why an operator and not a window: `row_number().over(...)  <= k`
  * shuffles and sorts EVERY row of every group. This operator is
  * algebraic — a bounded heap per key combines associatively — so the
  * strategy plans it in two stages like partial aggregation:
  *
  *   TopKPerKeyExec(final)   <- ClusteredDistribution(keys): exact per key
  *     Exchange(hash(keys))  <- inserted by EnsureRequirements
  *       TopKPerKeyExec(partial)  <- runs on each input partition
  *
  * The partial stage caps every input partition's contribution at k
  * rows per key, so the shuffle moves O(partitions * keys * k) rows
  * instead of all of them — at 100 TB that is the difference between
  * shuffling the table and shuffling a digest.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        GenerateOrdering.generate(
          BindReferences.bindReferences(orderExprs, childOutput))
      // per key: bounded heap, worst kept row on top (max under ordering)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](
            rowOrdering.asInstanceOf[Ordering[UnsafeRow]]))
        if (heap.size < kLocal) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrdering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // ordering-ascending per key
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame API: rows ranked first under `orderCols` per distinct
    * `keyCols` tuple, at most k per key, emitted in rank order. Columns
    * built with `.desc`/`.asc` keep their direction; bare columns sort
    * ascending. Registers the planner strategy on the session
    * idempotently — no extensions config needed. */
  def topKPerKey(df: DataFrame, k: Int, keyCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    val spark: SparkSession = df.sparkSession
    // read-modify-write on a plain var — lock so two threads planning
    // their first TopKPerKey concurrently can't lose a registration
    spark.synchronized {
      if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKPerKeyStrategy]))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ new TopKPerKeyStrategy
    }
    val order = orderCols.map(c => SqlBridge.toCatalyst(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    SqlBridge.ofRows(spark,
      TopKPerKey(k, keyCols.map(SqlBridge.toCatalyst), order, SqlBridge.logicalPlan(df)))
  }
}
