package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Coalesce, Divide, ExprId, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Materialized-summary registry: base table path → its maintained
  * per-key aggregate (the table [[graft.pipeline.IncrementalFinal
  * .maintainAggregate]] keeps current). Registering here is the
  * caller's promise that the summary IS current — maintenance is the
  * IVM pair's job; this registry only routes.
  *
  * `mv` is a thunk so every rewrite gets a freshly-analyzed plan
  * (fresh attribute ids — reusing one analyzed plan across rewrites
  * would collide exprIds if a query hits the rule twice). */
object MvRegistry {

  /** `groupCols`: the summary's grain (composite grains supported —
    * order is not significant, grouping columns match by NAME);
    * `cntCol`: its row count; `sums`/`nns`/`mins`/`maxs`: base column
    * name → summary column holding its SUM / non-null COUNT / MIN /
    * MAX. A base column present in BOTH `sums` and `nns` additionally
    * licenses the AVG rewrite (avg = Σsum / Σnn — avg ignores nulls,
    * so the row count is the WRONG denominator; the nn column is
    * maintainAggregate's nnCol). */
  final case class Summary(mv: () => DataFrame, groupCols: Seq[String],
                           cntCol: String, sums: Map[String, String],
                           nns: Map[String, String] = Map.empty,
                           mins: Map[String, String] = Map.empty,
                           maxs: Map[String, String] = Map.empty) {
    require(groupCols.nonEmpty && groupCols.distinct.size == groupCols.size,
      s"summary grain must be non-empty distinct columns, got $groupCols")
  }

  object Summary {
    /** Single-column-grain convenience (the common case). */
    def apply(mv: () => DataFrame, groupCol: String, cntCol: String,
              sums: Map[String, String], nns: Map[String, String],
              mins: Map[String, String], maxs: Map[String, String]): Summary =
      Summary(mv, Seq(groupCol), cntCol, sums, nns, mins, maxs)
  }

  private val reg = new ConcurrentHashMap[String, Summary]()

  def register(basePath: String, s: Summary): Unit = reg.put(basePath, s)
  def clear(): Unit = reg.clear()
  private[plans] def lookup(path: String): Option[Summary] =
    Option(reg.get(path))
}

/** Transparent aggregate-to-summary routing — the optimizer half of the
  * materialized-view story (the IVM operators keep the summary fresh;
  * this rule makes queries USE it without being rewritten by hand).
  * An `Aggregate` over a registered base relation whose shape the
  * summary can answer is re-planned onto the summary:
  *
  *   COUNT(1)  over base  →  SUM(cnt)   over summary (coalesced to
  *                                        keep COUNT's non-null type)
  *   SUM(x)    over base  →  SUM(sum_x) over summary
  *   grain     ⊆ the summary's group columns (any order; a STRICT
  *               subset re-aggregates the summary — every served
  *               function is already written as a re-aggregation, so
  *               coarser grains including the global ⟨⟩ grain are
  *               exactly answerable)
  *   filters   allowed when they reference grain columns ONLY (a
  *               grain predicate is constant within each group, so it
  *               transfers to the summary verbatim — the
  *               partition-filter shape); any other filter bails
  *
  * At 100 TB this is the difference between scanning the corpus and
  * scanning |keys| rows — the rewrite every lakehouse engine ships
  * (Materialize/Snowflake MV routing, Databricks MV). The rule is
  * deliberately CONSERVATIVE: a non-grain or non-deterministic
  * filter, distinct, other aggregate function, expression-valued
  * grouping, extra column, or multi-root relation bails to the
  * original plan — a wrong rewrite is a silent wrong answer, so only
  * the exactly-provable shape rewrites. Output
  * attribute ids (and types) are preserved, so parent operators never
  * see the switch.
  *
  * Known numeric note (AVG): Spark's native `Average` over integral
  * input accumulates the running sum in DOUBLE, rounding per add; the
  * routed plan folds the summary's EXACT long sums and casts each to
  * double before its own double fold. Both are double-rounded
  * accumulations (neither is deterministic past 2⁵³ — partial-agg
  * order varies run to run), but below |Σ| < 2⁵³ every intermediate is
  * exactly representable and routed ≡ unrouted bit-for-bit. The
  * routed form is the MORE exact of the two beyond that (fewer
  * roundings); the divergence domain is documented here rather than
  * hidden.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`); with an
  * empty [[MvRegistry]] the rule is a no-op, so the gated inventory's
  * plans are untouched unless a summary is explicitly registered
  * (SummaryRewriteSpec proves both directions). */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** The parquet root path under Aggregate's child plus any Filter
    * conditions sitting between them, looking through column-pruning
    * Projects. Collected filters are only USABLE when every column
    * they reference is a grain column (checked at the call site): a
    * grain predicate is constant within each group, so applying it to
    * the summary selects exactly the qualifying groups — the
    * partition-filter case every MV router must serve. Non-
    * deterministic conditions bail here (re-evaluating them over
    * |keys| rows instead of the corpus changes semantics). A relation
    * reading MULTIPLE roots (spark.read.parquet(base, other)) is NOT
    * the registered base even when one root matches — routing it
    * would answer for the union out of one path's summary, so
    * multi-root bails. */
  private def collectBase(plan: LogicalPlan)
  : Option[(String, Seq[Expression])] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
        Some((fs.location.rootPaths.head.toString, Nil))
      case _ => None
    }
    case Project(projList, child)
      if projList.forall(_.isInstanceOf[AttributeReference]) =>
      collectBase(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child)
      if cond.deterministic =>
      collectBase(child).map { case (p, fs) => (p, cond +: fs) }
    case _ => None
  }

  private def isConst(e: Expression): Boolean = e match {
    case l: Literal => l.value != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupExprs, aggExprs, child, None)
      if groupExprs.forall(_.isInstanceOf[AttributeReference]) =>
      val gs = groupExprs.map(_.asInstanceOf[AttributeReference])
      (for {
        (path, filters) <- collectBase(child)
        s <- MvRegistry.lookup(path)
        // query grain = a duplicate-free subset of the summary grain
        // (any order); grouping by anything finer/other bails
        if gs.map(_.name).distinct.size == gs.size &&
          gs.forall(g => s.groupCols.contains(g.name))
        // every filter must touch grain columns ONLY — a predicate on
        // any other column needs row-level data the summary lost
        if filters.forall(_.references.forall(a =>
          s.groupCols.contains(a.name)))
        rewritten <- rewriteAll(agg, gs, aggExprs, s, filters)
      } yield rewritten).getOrElse(agg)
  }

  private def rewriteAll(agg: Aggregate, gs: Seq[AttributeReference],
                         aggExprs: Seq[NamedExpression],
                         s: MvRegistry.Summary,
                         filters: Seq[Expression]): Option[LogicalPlan] = {
    val mvPlan = s.mv().queryExecution.analyzed
    def mvAttr(name: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    val mvCnt = mvAttr(s.cntCol)
    // grouping attr exprId → its summary twin
    val mvGroups: Map[ExprId, AttributeReference] = gs.flatMap(g =>
      mvAttr(g.name).map(g.exprId -> _)).toMap
    if (mvGroups.size != gs.size || mvCnt.isEmpty) return None

    val out = aggExprs.map {
      // a grouping column itself: re-point at the summary's, keeping
      // the original exprId so parents still resolve
      case a: AttributeReference if mvGroups.contains(a.exprId) =>
        Some(Alias(mvGroups(a.exprId), a.name)(exprId = a.exprId))
      case al @ Alias(AggregateExpression(Count(Seq(c)), _, false, None, _), name)
        if isConst(c) =>
        // COUNT(const) ≡ row count ≡ Σ summary.cnt; coalesce keeps
        // COUNT's non-nullable BIGINT type (vacuous per group, exact
        // for the grand total over an empty base)
        Some(Alias(
          Coalesce(Seq(
            Sum(mvCnt.get).toAggregateExpression(),
            Literal(0L))), name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), name)
        if s.sums.contains(a.name) && mvAttr(s.sums(a.name)).isDefined &&
          mvAttr(s.sums(a.name)).get.dataType == al.dataType =>
        Some(Alias(Sum(mvAttr(s.sums(a.name)).get).toAggregateExpression(),
          name)(exprId = al.exprId))
      // COUNT(col): non-null count ≡ Σ summary.nn (coalesced: COUNT is
      // non-nullable)
      case al @ Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _), name)
        if s.nns.contains(a.name) && mvAttr(s.nns(a.name)).isDefined =>
        Some(Alias(Coalesce(Seq(
          Sum(mvAttr(s.nns(a.name)).get).toAggregateExpression(),
          Literal(0L))), name)(exprId = al.exprId))
      // AVG(col) = Σ sum_col / Σ nn_col — nulls ignored by avg, so the
      // non-null count is the denominator; an all-null group has a
      // null summary sum and the division stays null, matching avg.
      // The numerator folds DOUBLE-cast summary sums (replicating
      // native Average's double accumulation — see the scaladoc's
      // numeric note); the denominator is an exact long fold cast once.
      case al @ Alias(AggregateExpression(Average(a: AttributeReference, _), _, false, None, _), name)
        if s.sums.contains(a.name) && s.nns.contains(a.name) &&
          mvAttr(s.sums(a.name)).isDefined && mvAttr(s.nns(a.name)).isDefined &&
          al.dataType == DoubleType =>
        Some(Alias(
          Divide(
            Sum(Cast(mvAttr(s.sums(a.name)).get, DoubleType))
              .toAggregateExpression(),
            Cast(Sum(mvAttr(s.nns(a.name)).get).toAggregateExpression(),
              DoubleType)),
          name)(exprId = al.exprId))
      // MIN/MAX: re-aggregate the summary extremes — exact at the
      // summary grain (one row per group) and at any coarser grain
      // (min of mins IS the min)
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), name)
        if s.mins.contains(a.name) && mvAttr(s.mins(a.name)).isDefined &&
          mvAttr(s.mins(a.name)).get.dataType == al.dataType =>
        Some(Alias(
          Min(mvAttr(s.mins(a.name)).get).toAggregateExpression(),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), name)
        if s.maxs.contains(a.name) && mvAttr(s.maxs(a.name)).isDefined &&
          mvAttr(s.maxs(a.name)).get.dataType == al.dataType =>
        Some(Alias(
          Max(mvAttr(s.maxs(a.name)).get).toAggregateExpression(),
          name)(exprId = al.exprId))
      case _ => None // anything else: not provably answerable — bail
    }
    if (out.exists(_.isEmpty)) return None
    // re-point each grain filter's attributes at the summary's; a
    // referenced grain column missing from the summary output bails
    val remapped = filters.map { f =>
      var ok = true
      val rf = f.transform {
        case a: AttributeReference =>
          mvAttr(a.name) match {
            case Some(m) if m.dataType == a.dataType => m
            case _ => ok = false; a
          }
      }
      if (ok) Some(rf) else None
    }
    if (remapped.exists(_.isEmpty)) return None
    val child = remapped.flatten.foldRight(mvPlan) { (f, acc) =>
      org.apache.spark.sql.catalyst.plans.logical.Filter(f, acc)
    }
    Some(Aggregate(gs.map(g => mvGroups(g.exprId)), out.map(_.get), child))
  }
}
