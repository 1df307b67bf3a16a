package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShims, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator grouped top-k: the first k rows per key under an
  * ordering, with their ranks — the operator behind every "top N per
  * group" query.
  *
  * Spark's built-in expression of this is `row_number().over(window)` +
  * `filter(rn <= k)`, which EnsureRequirements plans as shuffle + **full
  * sort of every partition** (O(n log n) comparisons, full spill
  * surface) before the window operator scans and discards. This operator
  * declares only `ClusteredDistribution(keys)` — same shuffle, *no sort*
  * — and keeps a bounded k-element heap per key (O(n log k), memory
  * bounded by #keys·k rows per partition). At 100 TB, not sorting the
  * 99.999% of rows that lose is the whole game.
  *
  * The reference has no window machinery at all (SURVEY.md §2.3), so
  * this is the (c)-tier custom-operator path from the design brief:
  * LogicalPlan + Strategy + SparkPlan, injectable via
  * [[graft.GraftExtensions]] or `spark.experimental.extraStrategies`.
  */
case class GroupedTopK(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): GroupedTopK = copy(child = c)
}

case class GroupedTopKExec(
    groupKeys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** Co-locate each key's rows; deliberately NO requiredChildOrdering —
    * avoiding the sort is the point.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupKeys) :: Nil

  /** Rows stay where the child's exchange put them, so a downstream
    * groupBy/join on the same keys must not re-shuffle.
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal        = k
    val keyExprs      = groupKeys
    val orderExprs    = order
    val childOutput   = child.output
    val outputAttrs   = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord     = GenerateOrdering.generate(orderExprs, childOutput)
      // downstream operators require UnsafeRow — project the joined
      // (row, rank) through the output schema
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      // max-heap under `ord`: the head is the current worst of the best-k,
      // evicted when a better row arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        // copy the projected key only on first sight — the common case
        // (key already present) must not allocate
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // rank column type follows the rank attribute: int when substituted
      // for row_number() by WindowToTopKRule, long from the Scala API
      val rankIsInt = rankAttr.dataType == org.apache.spark.sql.types.IntegerType
      val joiner    = new JoinedRow
      heaps.iterator.flatMap { case (_, heap) =>
        val worstFirst: Seq[InternalRow] = heap.dequeueAll
        worstFirst.reverseIterator.zipWithIndex.map { case (r, i) =>
          val rank = if (rankIsInt) InternalRow(i + 1) else InternalRow(i + 1L)
          outProj(joiner(r, rank)).copy()
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): GroupedTopKExec = copy(child = c)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(keys, order, k, rank, child) =>
      GroupedTopKExec(keys, order, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {

  /** Idempotent registration of the planner strategy only — what the
    * Scala `topK` API needs. The window-rewrite rule is a separate,
    * explicit opt-in ([[registerRewrite]] / [[graft.GraftExtensions]] /
    * [[graft.Catalog.registerViews]]) so sessions that want to exercise
    * Spark's own window operator aren't silently rerouted.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy

  /** Opt in to the transparent row_number-top-N rewrite. */
  def registerRewrite(spark: SparkSession): Unit = {
    register(spark)
    if (!spark.experimental.extraOptimizations.contains(WindowToTopKRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ WindowToTopKRule
  }

  /** Remove the rewrite (the strategy is harmless to leave). */
  def unregisterRewrite(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == WindowToTopKRule)

  /** Top `k` rows per `keys` group under `order` (column name → ascending?),
    * with a 1-based rank column appended. Names become catalyst
    * `UnresolvedAttribute`s; the analyzer resolves them against the child
    * like any built-in operator's expressions.
    */
  def topK(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[(String, Boolean)],
      k: Int,
      rankName: String = "rn"): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    require(k >= 1, s"topK requires k >= 1, got $k")
    val spark = df.sparkSession
    register(spark)
    val sortOrders = order.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlShims.ofRows(
      spark,
      GroupedTopK(keys.map(UnresolvedAttribute.quoted), sortOrders, k, rankAttr,
        df.queryExecution.analyzed))
  }
}
