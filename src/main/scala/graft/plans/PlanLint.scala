package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter: the scale anti-patterns this repo's plan
  * audits check by hand, packaged as a library call so a user can gate
  * THEIR compositions the same way ("would this survive 100×?").
  *
  * Rules (each finding = (rule, node) pair):
  *  - `cartesian-product` — CartesianProductExec: O(n·m) pairs; at
  *    corpus scale this is the job that never finishes.
  *  - `nested-loop-join` — BroadcastNestedLoopJoinExec: a non-equi
  *    join condition scanning the broadcast side per row.
  *  - `global-window` — WindowExec with an EMPTY partition spec: every
  *    row funnels through ONE task (Spark's own WindowExec warning,
  *    surfaced as data instead of a log line).
  *  - `single-partition-exchange` — any Exchange SinglePartition: a
  *    serialization point that caps throughput at one core (legitimate
  *    under a final limit/collect of a small frame — the question to
  *    ask is whether the frame is small).
  *  - `single-partition-corpus-sort` — a SinglePartition exchange
  *    whose input is ESTIMATED corpus-sized: walking down from the
  *    exchange hits file scans totalling ≥ `corpusBytes` without
  *    passing a cardinality-bounding node (limit, take-ordered,
  *    aggregate, literal scan). This is the r11 `orderedSmall`-
  *    on-a-corpus-dump class: a per-row pipeline whose whole result
  *    funnels through ONE task — fine at test SF, the last-stage
  *    bottleneck at 100×. Fix: materialize once and range-sort
  *    (`orderedCorpus`), or bound the result. Heuristic misses, by
  *    design: grouped aggregates are treated as bounded (a
  *    `groupBy(doc_id)` is corpus-cardinality but indistinguishable
  *    from a 20-row report without real cardinality stats), and
  *    checkpointed/cached inputs are not estimable (silent, not
  *    noisy).
  *  - `unpushed-scan-filter` — a parquet scan carrying data filters
  *    none of which reached PushedFilters: row groups can't prune, the
  *    scan reads everything and filters after decode.
  *  - `nlj-streamed-eval` — an expensive projection on the STREAMED
  *    side of a nested-loop join with no materialization boundary in
  *    between: whole-stage codegen emits deferred expression code at
  *    its first use site, which for a nested-loop join is INSIDE the
  *    per-build-row loop — the expression re-executes once per PAIR,
  *    not once per row (measured 20× on a signature kernel under a
  *    20-row broadcast probe). Fix: localCheckpoint/persist the
  *    computed side, or put any exchange between compute and join.
  *  - `range-sort-resample` — a global sort (range exchange) whose
  *    input pipeline contains expensive projections and no
  *    materialization boundary: range partitioning SAMPLES its input
  *    with a separate job first, so everything below the sort that is
  *    not already behind a shuffle executes TWICE per action. Fix for
  *    a small final result: one SinglePartition exchange + local sort;
  *    or materialize before sorting.
  *
  * Inspection only — it never changes the plan. Heuristic by design:
  * a flagged node is a question to answer ("is this frame tiny?"),
  * not always a bug; a clean report over a plan that composes only
  * keyed exchanges, equi-joins and pushed scans is the posture every
  * operator in this library plan-asserts. */
object PlanLint {

  case class Finding(rule: String, node: String)

  /** Default `corpusBytes` for the single-partition-corpus-sort rule:
    * one comfortable scan partition. Anything bigger funnelling into
    * one task is worth a look; anything smaller sorts in-memory on one
    * core without being the job's bottleneck. */
  val DefaultCorpusBytes: Long = 64L << 20

  def lint(df: DataFrame): Seq[Finding] = lint(df, DefaultCorpusBytes)

  def lint(df: DataFrame, corpusBytes: Long): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    collectAll(unwrap(plan), corpusBytes).distinct
  }

  /** AQE wraps the real plan; lint what will actually execute. */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def short(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(160)

  /** Catalyst infers `size(<generator input>) > 0` on the scan under
    * every explode — unpushABLE by construction (a function of the
    * column), not an unpushed user predicate; counting it would flag
    * every explode-over-parquet plan. The rule's actual target is a
    * user predicate that COULD have pruned row groups had it been
    * written attribute-vs-literal (the q_filter_tags class). */
  private def isGeneratorConstraint(
      f: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, Literal, Size}
    f match {
      case GreaterThan(_: Size, Literal(v, _)) => v == 0
      case _ => false
    }
  }

  /** Heuristic "this expression is worth not re-running": a custom
    * kernel (graft package), a higher-order function (array folds —
    * norms, dot products), regex, an object-call bridge, or simply a
    * big tree. Cheap per-column plumbing (alias/cast/attr) stays cold. */
  private def isExpensive(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    var n = 0
    var hot = false
    e.foreach { x =>
      n += 1
      val cn = x.getClass.getName
      if (cn.startsWith("graft.") || x.isInstanceOf[HigherOrderFunction] ||
          cn.contains("RegExp") || cn.contains("Invoke")) hot = true
    }
    hot || n >= 16
  }

  /** Walk down from `p` looking for a projection/filter with an
    * expensive expression, STOPPING at any node that materializes rows
    * (exchange, shuffle stage, cached/checkpointed scan, sort,
    * aggregate, generate): expressions behind such a boundary evaluate
    * once per row no matter what consumes them above. */
  private def expensiveBelow(p: SparkPlan): Option[SparkPlan] = {
    import org.apache.spark.sql.execution.{GenerateExec, ProjectExec, RDDScanExec, SortExec}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    p match {
      case _: Exchange | _: QueryStageExec | _: InMemoryTableScanExec |
          _: RDDScanExec | _: SortExec | _: BaseAggregateExec |
          _: GenerateExec => None
      case pr: ProjectExec if pr.projectList.exists(isExpensive) => Some(pr)
      case f: org.apache.spark.sql.execution.FilterExec
          if isExpensive(f.condition) => Some(f)
      case other => other.children.flatMap(expensiveBelow).headOption
    }
  }

  /** Bytes of file-scan input reaching `p` from below WITHOUT passing
    * a cardinality-bounding node — the "is the frame small?" question
    * answered from the plan, upper-bound flavored (filters and joins
    * don't discount; a branch is what its biggest scan is). Bounding
    * nodes → 0: limits/take-ordered (bounded by k), aggregates (the
    * documented grouped-key heuristic), literal scans, broadcast
    * (driver-collected by contract). Checkpoint/cache scans are not
    * estimable from here → 0 (silent, not noisy — Spark's stats
    * default them to Long.MaxValue, which would flag every
    * materialize-then-present shape). */
  private def unboundedScanBytes(p: SparkPlan): BigInt = {
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RDDScanExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    p match {
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
          _: TakeOrderedAndProjectExec | _: BaseAggregateExec |
          _: LocalTableScanExec | _: RDDScanExec |
          _: InMemoryTableScanExec | _: BroadcastExchangeExec => 0
      case s: FileSourceScanExec => BigInt(s.relation.location.sizeInBytes)
      case q: QueryStageExec => unboundedScanBytes(q.plan)
      // exchange reuse replaces the second occurrence with a childless
      // wrapper — resolve through it or a reused corpus scan evades
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        unboundedScanBytes(r.child)
      case other =>
        other.children.map(unboundedScanBytes)
          .foldLeft(BigInt(0))(_ max _)
    }
  }

  private def collectAll(root: SparkPlan, corpusBytes: Long): Seq[Finding] = {
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val out = Seq.newBuilder[Finding]
    root.foreach {
      case c: CartesianProductExec =>
        out += Finding("cartesian-product", short(c))
        expensiveBelow(c.left).orElse(expensiveBelow(c.right)).foreach(pr =>
          out += Finding("nlj-streamed-eval", short(pr)))
      case j: BroadcastNestedLoopJoinExec =>
        out += Finding("nested-loop-join", short(j))
        // only the streamed side loops per build row; the build side is
        // collected once into the broadcast relation
        val streamed = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
          case _ => j.left
        }
        expensiveBelow(streamed).foreach(pr =>
          out += Finding("nlj-streamed-eval", short(pr)))
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] =>
        expensiveBelow(e.child).foreach(pr =>
          out += Finding("range-sort-resample", short(pr)))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += Finding("global-window", short(w))
      case e: ShuffleExchangeExec
          if e.outputPartitioning.numPartitions == 1 =>
        out += Finding("single-partition-exchange", short(e))
        if (unboundedScanBytes(e.child) >= corpusBytes)
          out += Finding("single-partition-corpus-sort", short(e))
      case s: FileSourceScanExec
          if s.dataFilters.exists(f =>
              !f.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.IsNotNull] &&
              !isGeneratorConstraint(f)) &&
            s.metadata.get("PushedFilters").exists(m =>
              m.replaceAll("IsNotNull\\([^)]*\\)", "")
                .replaceAll("[\\[\\], ]", "").isEmpty) =>
        // real predicates on the scan, but nothing beyond the implicit
        // null checks reached the reader — row groups cannot prune
        out += Finding("unpushed-scan-filter", short(s))
      case _ => ()
    }
    out.result()
  }
}
