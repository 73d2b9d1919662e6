package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator custom plan — tier (c) of the SURVEY §2 custom-op
  * preference order: a logical node + optimizer [[Rule]] + [[SparkStrategy]]
  * + physical exec, injected through `spark.experimental` (or
  * [[GraftExtensions]] via `spark.sql.extensions`).
  *
  * Semantics: per-key top-k with ranks — what users write as
  *
  *   row_number() OVER (PARTITION BY keys ORDER BY ord) AS rn ... WHERE rn <= k
  *
  * The standard plan sorts every partition and runs WindowExec over ALL
  * rows (Spark's InferWindowGroupLimit bounds each group to k per task
  * but still sorts and still runs the window). [[TopKRewrite]] replaces
  * the whole Filter+Window pair with [[LogicalTopKPerKey]], planned as
  * two [[TopKPerKeyExec]] levels: map-side bounded heaps (k rows per
  * key per partition), shuffle ONLY the surviving <= k rows per key,
  * final heaps + rank emission. No sort of the input anywhere, state
  * bounded by k*keys — the 100 TB shape for "top products per
  * category"-style queries.
  *
  * Caveats (documented contract): rank ties at the k boundary follow
  * the same arbitrary-choice semantics as row_number over a non-unique
  * ORDER BY; rewrite fires only when the rank attribute's only other
  * use is the filter itself (checked structurally: the filter sits
  * directly on the Window); and the per-task state (k rows per
  * distinct key in the task) is heap-held with NO spill — the right
  * trade for small k and bounded key cardinality per task, while
  * extreme keys-per-task x k workloads should stay on WindowExec
  * (which sorts with spill). Two guards keep the rewrite safe to leave
  * enabled session-globally: it skips plans with k >
  * `spark.graft.topk.maxK` (default 1000) and plans with an EMPTY
  * partition spec (one unbounded global group — WindowGroupLimit
  * handles those), and the exec reports a `heap-resident rows` SQL
  * metric so oversized heap state is observable. */
case class LogicalTopKPerKey(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalTopKPerKey =
    copy(child = newChild)
}

/** Two-level physical operator; `partial = true` keeps k rows per key
  * per input partition (no rank output), `partial = false` requires
  * clustering on the keys and emits ranks. */
case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) UnspecifiedDistribution :: Nil
    else if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "heapRows" -> SQLMetrics.createMetric(sparkContext, "heap-resident rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val partExprs = partitionSpec
    val orders = orderSpec
    val limit = k
    val emitRank = rankAttr.isDefined
    val childOutput = child.output
    val outAttrs = output
    val heapRows = longMetric("heapRows")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val ordEvals = orders.map(so => BindReferences.bindReference(so.child, childOutput)).toArray
      val cmp = TopKPerKey.comparator(orders)
      // heap head = WORST of the kept k (evicted first)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Array[Any], InternalRow)]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[(Array[Any], InternalRow)](limit + 1, cmp.reversed())
          heaps.put(key.copy(), heap)
        }
        // copyValue: evaluated ordering keys may point into the reused
        // input row buffer (UTF8String/array/struct) — stored keys must
        // own their bytes or they mutate as the iterator advances
        if (heap.size() < limit) {
          heap.offer((ordEvals.map(e => InternalRow.copyValue(e.eval(row))),
            row.copy()))
        } else {
          val ord = ordEvals.map(_.eval(row))
          val worst = heap.peek()
          if (cmp.compare((ord, row), worst) < 0) {
            heap.poll()
            heap.offer((ord.map(InternalRow.copyValue), row.copy()))
          }
        }
      }
      // the task's peak heap state: rows only accumulate (evictions
      // poll+offer, net zero), so the final total IS the peak
      var held = 0L
      val hit = heaps.values().iterator()
      while (hit.hasNext) held += hit.next().size()
      heapRows.add(held)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val entries = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var cur: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!cur.hasNext && entries.hasNext) {
            val heap = entries.next().getValue
            val sorted = new Array[(Array[Any], InternalRow)](heap.size())
            var i = sorted.length - 1
            while (i >= 0) { sorted(i) = heap.poll(); i -= 1 } // poll = worst-first
            cur =
              if (!emitRank) sorted.iterator.map(_._2)
              else sorted.iterator.zipWithIndex.map { case ((_, row), idx) =>
                outProj(new JoinedRow(row,
                  new GenericInternalRow(Array[Any](idx + 1)))): InternalRow
              }
          }
          cur.hasNext
        }
        override def next(): InternalRow = cur.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule: Filter(rn <= k, Window(row_number as rn)) ->
  * [[LogicalTopKPerKey]]. Strips an InferWindowGroupLimit node if the
  * built-in optimizer already inserted one underneath. */
object TopKRewrite extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // no-spill heaps hold k rows per key per task: refuse oversized k
    // (sort+spill WindowExec is the safe plan there) and empty
    // partition specs (one global group — WindowGroupLimit's job)
    val maxK = conf.getConfString("spark.graft.topk.maxK", "1000").toInt
    plan.transformUp {
      case Filter(cond, w: Window)
          if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty =>
        w.windowExpressions.head match {
          case alias @ Alias(WindowExpression(_: RowNumber, _), _) =>
            rankLimit(cond, alias.toAttribute) match {
              case Some(k) if k > 0 && k <= maxK =>
                val innerChild = w.child match {
                  case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
                  case c => c
                }
                LogicalTopKPerKey(w.partitionSpec, w.orderSpec, k,
                  alias.toAttribute, innerChild)
              case _ => Filter(cond, w)
            }
          case _ => Filter(cond, w)
        }
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LogicalTopKPerKey(parts, orders, k, rank, child) =>
      val partial = TopKPerKeyExec(parts, orders, k, None, planLater(child))
      TopKPerKeyExec(parts, orders, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Lexicographic "better-than" on the SortOrder directions; rank 1 =
    * the minimum under this comparison. (Static so executor closures
    * never capture a SparkPlan.) */
  private[plans] def comparator(bound: Seq[SortOrder]): java.util.Comparator[(Array[Any], InternalRow)] = {
    val fieldCmp: Array[(Any, Any) => Int] = bound.map { so =>
      val ord = TypeUtils.getInterpretedOrdering(so.child.dataType)
      val nullsSmallest = (so.direction == Ascending) == (so.nullOrdering == NullsFirst)
      (a: Any, b: Any) => {
        val c =
          if (a == null && b == null) 0
          else if (a == null) { if (nullsSmallest) -1 else 1 }
          else if (b == null) { if (nullsSmallest) 1 else -1 }
          else ord.compare(a, b)
        if (so.direction == Ascending) c else -c
      }
    }.toArray
    (x: (Array[Any], InternalRow), y: (Array[Any], InternalRow)) => {
      var i = 0
      var c = 0
      while (i < fieldCmp.length && c == 0) {
        c = fieldCmp(i)(x._1(i), y._1(i))
        i += 1
      }
      c
    }
  }

  /** Inject rule + strategy into the session (idempotent) — the
    * same-session analog of configuring [[GraftExtensions]]. */
  def register(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(TopKStrategy)) {
      em.extraStrategies = em.extraStrategies :+ TopKStrategy
    }
    if (!em.extraOptimizations.contains(TopKRewrite)) {
      em.extraOptimizations = em.extraOptimizations :+ TopKRewrite
    }
  }
}
