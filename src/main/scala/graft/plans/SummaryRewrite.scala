package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.LongType

/** Materialized-rollup rewrite: answer aggregates over a huge base
  * table from a pre-aggregated summary table, transparently.
  *
  * The 100 TB motivation: BI-style aggregates over the fact table
  * (`GROUP BY` a handful of dimension keys) re-scan the same
  * petabytes for every dashboard refresh. A rollup materialized ONCE
  * at finer granularity than any query answers all of them — IF the
  * engine routes queries to it. This rule is that router: queries
  * keep referencing the base table; plans come out reading the
  * summary. SUM/MIN/MAX/COUNT re-aggregate losslessly from partials
  * (they're decomposable: sum of group sums = total sum, etc.), so
  * results are BIT-IDENTICAL to scanning the base — the oracle query
  * proves exactly that. AVG and DISTINCT aggregates are NOT
  * decomposable from these partials and never rewrite (AVG because
  * its result type/rounding would differ from sum÷count replay;
  * COUNT(DISTINCT) because partial distinct counts don't add).
  *
  * Matched shape: `Aggregate` whose grouping keys are a SUBSET of the
  * rollup's key columns (plain attribute references), whose aggregate
  * functions are non-distinct, unfiltered SUM/MIN/MAX/COUNT over
  * measure attributes (or COUNT(*)), sitting directly on the
  * registered base scan — optionally through attribute-only Projects
  * and Filters that reference key columns only (a key predicate
  * commutes with the rollup: it drops whole groups). Anything else is
  * left untouched.
  *
  * Rewrites substitute, per ROW-count semantics:
  *   - `SUM(m)`    → `SUM(__sum_m)`
  *   - `MIN(m)`    → `MIN(__min_m)`, `MAX(m)` → `MAX(__max_m)`
  *   - `COUNT(*)`  → `COALESCE(SUM(__cnt), 0)` (empty base: COUNT is
  *                   0 where SUM is null — the coalesce keeps global
  *                   aggregates exact)
  *   - `COUNT(m)`  → `COALESCE(SUM(__cnt_m), 0)`
  * with every output re-aliased under its ORIGINAL exprId (parents
  * keep resolving) and cast back to the original result type (summing
  * decimal partials widens precision; the cast restores the contract).
  *
  * Registration is per-path ([[SummaryCatalog.register]]): the rule
  * identifies the base scan by its file-source root paths, the stable
  * identity that survives plan copies. Registered through
  * [[graft.functions.GraftExtensions]] next to [[BandJoinRewrite]].
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SummaryCatalog.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    // 1) peel attribute-only Projects and key-only Filters down to a
    //    registered base scan, keeping the filter conditions
    var node: LogicalPlan = agg.child
    var filters: Seq[Expression] = Nil
    var done = false
    while (!done) {
      node match {
        case Project(exprs, child)
            if exprs.forall(_.isInstanceOf[AttributeReference]) =>
          node = child
        case Filter(cond, child) =>
          filters = filters :+ cond
          node = child
        case _ => done = true
      }
    }
    val rel = node match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((lr, fs.location.rootPaths.map(_.toString).toSet))
      case _ => None
    }
    rel.flatMap { case (baseRel, paths) =>
      SummaryCatalog.lookup(paths).flatMap { ru =>
        rewriteWith(agg, baseRel, filters, ru)
      }
    }
  }

  private def rewriteWith(agg: Aggregate, baseRel: LogicalRelation,
      filters: Seq[Expression],
      ru: SummaryCatalog.Rollup): Option[Aggregate] = {
    val keySet = ru.keys.toSet
    // grouping keys: plain references to rollup key columns
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if keySet.contains(a.name) => a
      case _ => return None
    }
    // filters may only constrain key columns
    if (!filters.forall(_.references.forall(a => keySet.contains(a.name))))
      return None
    if (filters.exists(f => !f.deterministic)) return None

    // fresh summary scan instance (unique exprIds per rewrite site)
    val summary = ru.summaryPlan match {
      case m: MultiInstanceRelation => m.newInstance()
      case other                    => other
    }
    val sAttr: Map[String, Attribute] =
      summary.output.map(a => a.name -> a).toMap
    def s(name: String): Option[Attribute] = sAttr.get(name)

    def remapAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(a: AttributeReference, _) if ru.measures.contains(a.name) =>
        s(s"__sum_${a.name}").map(Sum(_).toAggregateExpression())
      case Min(a: AttributeReference) if ru.measures.contains(a.name) =>
        s(s"__min_${a.name}").map(Min(_).toAggregateExpression())
      case Max(a: AttributeReference) if ru.measures.contains(a.name) =>
        s(s"__max_${a.name}").map(Max(_).toAggregateExpression())
      case Count(Seq(Literal(_, _))) =>
        s("__cnt").map(c =>
          Coalesce(Seq(Sum(c).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference))
          if ru.measures.contains(a.name) =>
        s(s"__cnt_${a.name}").map(c =>
          Coalesce(Seq(Sum(c).toAggregateExpression(), Literal(0L))))
      case _ => None
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if keySet.contains(a.name) =>
        s(a.name) match {
          case Some(sa) => Alias(sa, a.name)(exprId = a.exprId)
          case None     => return None
        }
      case Alias(AggregateExpression(fn, Complete, false, None, _),
          name) =>
        val orig = agg.aggregateExpressions.find(_.name == name).get
        remapAgg(fn) match {
          case Some(e) =>
            val cast =
              if (e.dataType == orig.dataType) e
              else Cast(e, orig.dataType)
            Alias(cast, name)(exprId = orig.exprId)
          case None => return None
        }
      case _ => return None
    }

    val newGroup = groupAttrs.map(a => s(a.name).getOrElse(return None))
    val mapAttr: PartialFunction[Expression, Expression] = {
      case a: AttributeReference if keySet.contains(a.name) &&
          s(a.name).isDefined => s(a.name).get
    }
    val newChild = filters.foldRight(summary) { (cond, child) =>
      Filter(cond.transform(mapAttr), child)
    }
    Some(Aggregate(newGroup, newAggExprs, newChild))
  }
}

/** Registry of materialized rollups, keyed by the base table's
  * file-source root paths. Process-wide (one engine per JVM here);
  * [[clear]] resets between tests. */
object SummaryCatalog {

  /** A registered rollup: the base table's root paths, its key and
    * measure column names, and the ANALYZED logical plan of the
    * summary scan (a fresh instance is stamped per rewrite). */
  final case class Rollup(basePaths: Set[String], keys: Seq[String],
      measures: Seq[String], summaryPlan: LogicalPlan)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[Set[String], Rollup]()

  def isEmpty: Boolean = entries.isEmpty

  private[plans] def lookup(paths: Set[String]): Option[Rollup] =
    entries.asScala.collectFirst {
      case (base, ru) if paths.subsetOf(base) => ru
    }

  private def rootPaths(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location.rootPaths.map(_.toString)
    }.flatten.toSet

  /** Build the rollup convention from a base scan: one row per
    * distinct key combination carrying `__cnt` (row count) and
    * `__sum_/__min_/__max_/__cnt_` partials per measure. Materialize
    * this ONCE (write to parquet), then register the scan of the
    * materialized copy. */
  def buildSummary(base: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty,
      "rollup needs at least one key and one measure")
    val aggs = count(lit(1)).as("__cnt") +: measures.flatMap(m => Seq(
      sum(col(m)).as(s"__sum_$m"), min(col(m)).as(s"__min_$m"),
      max(col(m)).as(s"__max_$m"), count(col(m)).as(s"__cnt_$m")))
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Register `summary` (a MATERIALIZED scan — read back from its
    * parquet, not the live aggregation plan) as the rollup of `base`
    * over `keys`/`measures`. Subsequent aggregates on `base` whose
    * shape the rollup can answer are rewritten by [[SummaryRewrite]]
    * in every session carrying [[graft.functions.GraftExtensions]]. */
  def register(base: DataFrame, summary: DataFrame, keys: Seq[String],
      measures: Seq[String]): Unit = {
    val basePaths = rootPaths(base)
    require(basePaths.nonEmpty,
      "base must be a file-source scan (parquet/csv/json read)")
    val sumPaths = rootPaths(summary)
    require(sumPaths.nonEmpty,
      "summary must be a MATERIALIZED file-source scan; register the " +
        "read of the written rollup, not the aggregation plan")
    require(basePaths.intersect(sumPaths).isEmpty,
      "summary cannot be the base table itself")
    val plan = summary.queryExecution.analyzed
    val out = plan.output.map(_.name).toSet
    val expected = keys ++ Seq("__cnt") ++ measures.flatMap(m =>
      Seq(s"__sum_$m", s"__min_$m", s"__max_$m", s"__cnt_$m"))
    val missing = expected.filterNot(out.contains)
    require(missing.isEmpty,
      s"summary is missing rollup columns: ${missing.mkString(", ")} " +
        "(build it with SummaryCatalog.buildSummary)")
    entries.put(basePaths, Rollup(basePaths, keys, measures, plan))
  }

  def clear(): Unit = entries.clear()
}
