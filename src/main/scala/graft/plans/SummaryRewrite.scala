package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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

  /** `groupCol`: the summary's grain; `cntCol`: its row count;
    * `sums`/`nns`/`mins`/`maxs`: base column name → summary column
    * holding its SUM / non-null COUNT / MIN / MAX. A base column
    * present in BOTH `sums` and `nns` additionally licenses the AVG
    * rewrite (avg = Σsum / Σnn — avg ignores nulls, so the row count
    * is the WRONG denominator; the nn column is maintainAggregate's
    * nnCol). */
  final case class Summary(mv: () => DataFrame, groupCol: String,
                           cntCol: String, sums: Map[String, String],
                           nns: Map[String, String] = Map.empty,
                           mins: Map[String, String] = Map.empty,
                           maxs: Map[String, String] = Map.empty)

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
  *   grain     = exactly the summary's group column
  *
  * At 100 TB this is the difference between scanning the corpus and
  * scanning |keys| rows — the rewrite every lakehouse engine ships
  * (Materialize/Snowflake MV routing, Databricks MV). The rule is
  * deliberately CONSERVATIVE: any filter, distinct, other aggregate
  * function, expression-valued grouping, or extra column bails to the
  * original plan — a wrong rewrite is a silent wrong answer, so only
  * the exactly-provable shape rewrites. Output attribute ids (and
  * types) are preserved, so parent operators never see the switch.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`); with an
  * empty [[MvRegistry]] the rule is a no-op, so the gated inventory's
  * plans are untouched unless a summary is explicitly registered
  * (SummaryRewriteSpec proves both directions). */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** The parquet root path under Aggregate's child, looking through
    * column-pruning Projects only (a Filter means the summary cannot
    * answer — bail by returning None). */
  private def basePath(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }
    case Project(projList, child)
      if projList.forall(_.isInstanceOf[AttributeReference]) =>
      basePath(child)
    case _ => None
  }

  private def isConst(e: Expression): Boolean = e match {
    case l: Literal => l.value != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, None) =>
      (for {
        path <- basePath(child)
        s <- MvRegistry.lookup(path)
        if g.name == s.groupCol
        rewritten <- rewriteAll(agg, g, aggExprs, s)
      } yield rewritten).getOrElse(agg)
  }

  private def rewriteAll(agg: Aggregate, g: AttributeReference,
                         aggExprs: Seq[NamedExpression],
                         s: MvRegistry.Summary): Option[LogicalPlan] = {
    val mvPlan = s.mv().queryExecution.analyzed
    def mvAttr(name: String): Option[AttributeReference] =
      mvPlan.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }
    val mvGroup = mvAttr(s.groupCol)
    val mvCnt = mvAttr(s.cntCol)
    if (mvGroup.isEmpty || mvCnt.isEmpty) return None

    val out = aggExprs.map {
      // the grouping column itself: re-point at the summary's, keeping
      // the original exprId so parents still resolve
      case a: AttributeReference if a.exprId == g.exprId =>
        Some(Alias(mvGroup.get, a.name)(exprId = a.exprId))
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
      // null summary sum and the division stays null, matching avg
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Average(a: AttributeReference, _),
          _, false, None, _), name)
        if s.sums.contains(a.name) && s.nns.contains(a.name) &&
          mvAttr(s.sums(a.name)).isDefined && mvAttr(s.nns(a.name)).isDefined &&
          al.dataType == org.apache.spark.sql.types.DoubleType =>
        Some(Alias(
          org.apache.spark.sql.catalyst.expressions.Divide(
            org.apache.spark.sql.catalyst.expressions.Cast(
              Sum(mvAttr(s.sums(a.name)).get).toAggregateExpression(),
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.catalyst.expressions.Cast(
              Sum(mvAttr(s.nns(a.name)).get).toAggregateExpression(),
              org.apache.spark.sql.types.DoubleType)),
          name)(exprId = al.exprId))
      // MIN/MAX: the summary grain equals the query grain, so the
      // per-group extreme IS the summary value (kept as an aggregate
      // over the single summary row per group)
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(a: AttributeReference),
          _, false, None, _), name)
        if s.mins.contains(a.name) && mvAttr(s.mins(a.name)).isDefined &&
          mvAttr(s.mins(a.name)).get.dataType == al.dataType =>
        Some(Alias(
          org.apache.spark.sql.catalyst.expressions.aggregate.Min(
            mvAttr(s.mins(a.name)).get).toAggregateExpression(),
          name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(a: AttributeReference),
          _, false, None, _), name)
        if s.maxs.contains(a.name) && mvAttr(s.maxs(a.name)).isDefined &&
          mvAttr(s.maxs(a.name)).get.dataType == al.dataType =>
        Some(Alias(
          org.apache.spark.sql.catalyst.expressions.aggregate.Max(
            mvAttr(s.maxs(a.name)).get).toAggregateExpression(),
          name)(exprId = al.exprId))
      case _ => None // anything else: not provably answerable — bail
    }
    if (out.exists(_.isEmpty)) None
    else Some(Aggregate(Seq(mvGroup.get), out.map(_.get), mvPlan))
  }
}
