package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Descending, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst surface (SURVEY.md §2.9/§7.2 step 8; the
  * preference-order (c) path): exact top-k rows per group as a custom
  * LogicalPlan + SparkStrategy + SparkPlan — the rank-limit operator Spark
  * spells as `row_number().over(window)` + `filter(rn <= k)`.
  *
  * Why a custom operator: the window spelling SORTS every partition of
  * every group (O(n log n) per group, full materialization in the sort
  * buffer) to keep k rows. This exec keeps a bounded k-row heap per group
  * (O(n log k), memory k·groups), which is the difference between sorting
  * 100 TB and scanning it when k « group size.
  *
  * Scale behavior: `requiredChildDistribution = ClusteredDistribution`
  * makes Catalyst insert the one hash exchange on the group keys; after
  * it, each task folds its groups' rows into heaps — no sort, no spill
  * proportional to group size. A PARTIAL top-k ([[TopKPartialExec]]) runs
  * below the exchange — each map task pre-filters its partition to at
  * most k rows per group it sees (a strict superset of the global
  * answer, like partial aggregation), so the shuffle moves
  * ≤ k·groups·tasks rows instead of the full input. At 100 TB with
  * k=10 over thousands of groups, that is the difference between
  * shuffling terabytes and shuffling megabytes.
  *
  * Registered two ways: config-driven via [[GraftExtensions]]
  * (injectPlannerStrategy) and programmatically via
  * `spark.experimental.extraStrategies` ([[TopK.perGroup]] does this).
  * Correctness: q64 checks it against the DuckDB window spelling;
  * `TopKPerGroupSpec` checks it against Spark's own window spelling.
  */
case class TopKPerGroup(
    groupCols: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** The shared per-partition heap fold: at most k rows per group seen in
  * this partition, emitted group by group in `ord` order. */
private[plans] object TopKHeaps {
  def fold(iter: Iterator[InternalRow], groupExprs: Seq[Expression],
           sortOrder: Seq[SortOrder], childOutput: Seq[Attribute],
           k: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, childOutput)
    val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
    val worstFirst = ord.reverse // heap head = current worst of the k kept
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1, worstFirst)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().asScala.iterator.flatMap { heap =>
      val rows = heap.toArray(Array.empty[InternalRow])
      java.util.Arrays.sort(rows, ord)
      rows.iterator
    }
  }
}

/** Map-side partial: runs BELOW the exchange, cutting each input
  * partition to ≤ k rows per group it contains — a strict superset of the
  * global top-k (any globally-kept row is locally top-k wherever it
  * lives), so the final exec over the shuffled superset is exact. */
case class TopKPartialExec(
    groupCols: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupCols, ordering, k, child.output)
    child.execute().mapPartitions(TopKHeaps.fold(_, g, o, out, kk),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupCols: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** One hash exchange on the group keys; heaps then run shuffle-free. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (groupCols, ordering, k, child.output)
    child.execute().mapPartitions(TopKHeaps.fold(_, g, o, out, kk),
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.classic.Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // partial below the exchange (planner inserts it to satisfy the
      // final exec's required distribution), final above — the two-phase
      // shape of partial aggregation, for rank-limits.
      TopKPerGroupExec(g, o, k, TopKPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (the `Rule[LogicalPlan]` surface): rewrites the standard
  * rank-limit window spelling
  *
  *   Project(cols without rn,
  *     Filter(rn <= k, Window(rn := row_number() over (partition p order o))))
  *
  * into [[TopKPerGroup]](p, o, k) — so USER-written `row_number().over(w)
  * .filter(≤ k)` plans get the two-phase heap operator (bounded memory,
  * partial below the shuffle) without calling `TopK.perGroup` explicitly.
  * Strictly matched: exactly one row_number window expression, the filter
  * is a single bound on it (`<= k`, `< k+1`, or `= 1`), and the rank
  * column is NOT referenced above the filter (the operator doesn't emit
  * it). Ties at the k-th position are arrival-order nondeterministic in
  * BOTH spellings, so the rewrite never changes a deterministic result
  * (same contract as `TopK.perGroup`).
  *
  * MEMORY GATE: the heap exec holds k rows per group per task with no
  * spill path, so the rewrite only fires for k ≤
  * `spark.graft.topk.rewriteMaxK` (default 4096). A rank-limit above the
  * cap keeps the window spelling, whose sort spills — rewriting
  * `rn <= 10_000_000` into an unbounded executor heap would trade a
  * spill for an OOM. Explicit `TopK.perGroup` calls are NOT gated: the
  * caller chose the operator and its documented memory bound. */
object RankLimitRewrite extends Rule[LogicalPlan] {
  val MaxKConf = "spark.graft.topk.rewriteMaxK"
  val MaxKDefault = 4096

  private def maxK: Int = conf.getConfString(MaxKConf, MaxKDefault.toString).toInt

  private def bound(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
          Filter(cond, w @ Window(Seq(al @ Alias(
            WindowExpression(_: RowNumber, _), _)), partSpec, orderSpec, child, _)))
        if partSpec.nonEmpty && orderSpec.nonEmpty &&
          bound(cond, al.toAttribute).exists(k => k >= 1 && k <= maxK) &&
          projList.forall(e => !e.references.contains(al.toAttribute)) =>
      val k = bound(cond, al.toAttribute).get
      // Spark's own InferWindowGroupLimit (3.5+) may already have inserted
      // a WindowGroupLimit pre-filter for this window — redundant under
      // the heap operator, which IS a group limit; strip it.
      val cleanChild = child match {
        case wgl: WindowGroupLimit if wgl.limit >= k => wgl.child
        case c => c
      }
      Project(projList, TopKPerGroup(partSpec, orderSpec, k, cleanChild))
  }
}

object TopK {
  /** Top-k rows per group of `df`, ordered by `orderBy` (col, ascending?).
    * Resolves columns against df's analyzed plan, installs the strategy on
    * the session, and returns the custom-plan DataFrame.
    *
    * ORDERING CONTRACT: `orderBy` must be a TOTAL order within each group
    * (make the last key unique, e.g. the row id) — with ties at the k-th
    * position, WHICH tied row survives the heap depends on arrival order,
    * exactly as `row_number().over(window)` depends on partition order.
    * q64 satisfies this via the unique `p_partkey` tiebreak.
    *
    * MEMORY BOUND: each task holds k rows per group it sees — O(k ·
    * groups-per-partition · row size), with NO spill path. Right when
    * k « group size (the operator's whole point); for huge k or very many
    * tiny groups per partition, prefer the window spelling, which spills. */
  def perGroup(df: DataFrame, groupCols: Seq[String],
               orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val ordering = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(groupCols.map(attr), ordering, k, analyzed))
  }
}
