package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Native top-k-per-key operator (SURVEY custom-operator ladder, rung (c):
  * LogicalPlan + Strategy + SparkPlan via SparkSessionExtensions).
  *
  * Unlike `row_number().over(partitionBy …) <= k`, which shuffles every
  * row and sorts whole partitions, this plans as a PARTIAL bounded-heap
  * pass (≤ k rows per key leave each input partition) followed by an
  * exchange and a streaming FINAL pass over (key, order)-sorted rows. At
  * 100 TB the shuffle carries ≤ k·|keys| rows instead of the whole fact
  * table — the same partial/final shape Spark uses for aggregates.
  */
case class TopKPerKey(keys: Seq[Expression], orders: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Partition-local bounded heaps: emits at most k rows per key seen in
  * the partition (unordered — the final pass sorts).
  */
case class TopKPerKeyPartialExec(keys: Seq[Expression], orders: Seq[SortOrder],
                                 k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrders = orders
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // row comparator consistent with the requested output order
      val interpretedOrd =
        new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(sortOrders, childOutput)
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row).copy()
        val pq = heaps.getOrElseUpdate(key,
          mutable.PriorityQueue.empty[InternalRow](interpretedOrd))
        if (pq.size < kk) pq.enqueue(row.copy())
        else if (interpretedOrd.compare(row, pq.head) < 0) {
          pq.dequeue(); pq.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

/** Final pass: requires clustering by key and (key, orders) sort; streams
  * each key group and emits its first k rows.
  */
case class TopKPerKeyFinalExec(keys: Seq[Expression], orders: Seq[SortOrder],
                               k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec =
    copy(child = c)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(keys.map(SortOrder(_, Ascending)) ++ orders)
  override def outputOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ orders

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var currentKey: InternalRow = null
      var count = 0
      it.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || currentKey != key) {
          currentKey = key.copy(); count = 0
        }
        count += 1
        count <= kk
      }
    }
  }
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, orders, k, child) =>
      TopKPerKeyFinalExec(keys, orders, k,
        TopKPerKeyPartialExec(keys, orders, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top-k rows per key, ordered by `orderCols` (name, descending?) with
    * the caller responsible for including a unique tie-break column.
    */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val keys = keyCols.map(attr)
    val orders = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(df.sparkSession, TopKPerKey(keys, orders, k, child))
  }
}
