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
import org.apache.spark.sql.functions.{col, count, hll_sketch_agg,
  hll_union_agg, lit, max, min, sum}
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
  * results are BIT-IDENTICAL to scanning the base — `q_summary_rewrite`
  * proves exactly that against DuckDB aggregating the base, and
  * [[graft.SummaryRewriteSpec]] pins the rewrite firing, the
  * bit-equality, and every refusal case. AVG and DISTINCT aggregates
  * over MEASURES are NOT decomposable from these partials and never
  * rewrite (AVG because its result type/rounding would differ from
  * sum÷count replay; COUNT(DISTINCT m) because partial distinct
  * counts don't add) — but DISTINCT over KEY columns is (see below).
  *
  * Matched shape: `Aggregate` whose grouping keys are deterministic
  * expressions over the rollup's key columns (plain keys, or
  * `GROUP BY month(day_key)`-style derivations — grouping the finer
  * summary by f(key) merges exactly the base groups sharing f(key)),
  * whose aggregate functions are unfiltered SUM/MIN/MAX/COUNT over
  * measure attributes (or COUNT(*)), key-column aggregates as listed
  * above, sitting on the registered base scan — optionally through
  * deterministic Projects (alias bindings are resolved, so
  * `select(col("m").as("x"))` upstream still rewrites) and Filters
  * that reference key columns only (a key predicate commutes with the
  * rollup: it drops whole groups). Anything else is left untouched.
  *
  * Rewrites substitute, per ROW-count semantics:
  *   - `SUM(m)`    → `SUM(__sum_m)`
  *   - `MIN(m)`    → `MIN(__min_m)`, `MAX(m)` → `MAX(__max_m)`
  *   - `COUNT(*)`  → `COALESCE(SUM(__cnt), 0)` (empty base: COUNT is
  *                   0 where SUM is null — the coalesce keeps global
  *                   aggregates exact)
  *   - `COUNT(m)`  → `COALESCE(SUM(__cnt_m), 0)`
  * and, because the summary carries EVERY distinct key combination
  * (one row each), aggregates over KEY columns are answerable exactly
  * — including the one DISTINCT form the measure partials can never
  * serve:
  *   - `COUNT(DISTINCT k…)` → `COUNT(DISTINCT k…)` over the summary
  *                   (the 100-TB "distinct users per day" dashboard
  *                   hit: the distinct runs over the rollup's group
  *                   list, not the petabyte base; null keys form
  *                   their own summary row and are skipped by COUNT
  *                   DISTINCT on both sides, so results are identical)
  *   - `MIN(k)`/`MAX(k)` → `MIN(k)`/`MAX(k)` over the summary (a key
  *                   value exists in the base iff its group row exists)
  *   - `COUNT(k)`  → `COALESCE(SUM(IF(k IS NOT NULL, __cnt, 0)), 0)`
  *                   (non-null-key row count, re-weighted by group
  *                   size; the null-key group contributes zero)
  * (each of the key forms accepts deterministic key EXPRESSIONS, not
  * just bare columns), and approx-distinct over registered SKETCH
  * measures:
  *   - `hll_sketch_agg(m, lgK)` → `hll_union_agg(__hll_m)` — HLL
  *                   register max commutes with grouping, so the
  *                   union of per-group sketches estimates IDENTICALLY
  *                   to a sketch built over the base (lgK must match
  *                   the registration)
  * with every output re-aliased under its ORIGINAL exprId (parents
  * keep resolving) and cast back to the original result type (summing
  * decimal partials widens precision; the cast restores the contract).
  * Scalar structure around aggregates (casts, arithmetic,
  * hll_sketch_estimate, …) is preserved verbatim — it evaluates
  * identically over the exact re-aggregates.
  *
  * Registration is per-path ([[SummaryCatalog.register]]): the rule
  * identifies the base scan by its file-source root paths (EXACT set
  * equality — a subset scan reads less than the rollup aggregated and
  * must never rewrite), the stable identity that survives plan
  * copies. A file-level fingerprint taken at registration guards
  * staleness: once the base is appended to or overwritten, the rule
  * falls back to the live scan until the rollup is rebuilt and
  * re-registered. Registered through
  * [[graft.functions.GraftExtensions]] next to [[BandJoinRewrite]].
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SummaryCatalog.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  private def tryRewrite(agg: Aggregate): Option[Aggregate] = {
    // 1) peel deterministic Projects and Filters down to a registered
    //    base scan, keeping the filter conditions and each Project's
    //    alias bindings — the analyzer extracts complex grouping
    //    expressions into a computed Project below the Aggregate
    //    (`upper(k1) AS _groupingexpression#n`), and user code aliases
    //    columns through select(); resolving through the bindings lets
    //    the rewrite see the expressions in base-column terms
    var node: LogicalPlan = agg.child
    var filters: Seq[Expression] = Nil
    var subs: List[Map[ExprId, Expression]] = Nil // in peel order
    var done = false
    while (!done) {
      node match {
        case Project(exprs, child) if exprs.forall(_.deterministic) =>
          val m: Map[ExprId, Expression] = exprs.collect {
            case al @ Alias(c, _) => al.exprId -> c
          }.toMap
          if (m.nonEmpty) subs = subs :+ m
          node = child
        case Filter(cond, child) =>
          filters = filters :+ cond
          node = child
        case _ => done = true
      }
    }
    // substitute alias bindings outer-to-inner: an outer Project's
    // expression may reference an inner Project's aliases
    val resolve: Expression => Expression = e =>
      subs.foldLeft(e)((cur, m) => cur.transformUp {
        case a: Attribute if m.contains(a.exprId) => m(a.exprId)
      })
    filters = filters.map(resolve)
    val rel = node match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((lr, fs, fs.location.rootPaths.map(_.toString).toSet))
      case _ => None
    }
    rel.flatMap { case (baseRel, fs, paths) =>
      SummaryCatalog.lookup(paths).flatMap { ru =>
        // staleness guard: the rollup answers for the EXACT file set
        // it was built from. A base that was appended/overwritten
        // since register() must fall back to the live scan — silently
        // serving pre-append aggregates is a wrong answer, not a
        // cache hit. (A scan still holding the registration-time file
        // index reads exactly the registered files, so it rewrites —
        // both plans see the same data either way.)
        if (SummaryCatalog.fingerprint(fs) != ru.baseFingerprint) {
          logWarning(s"rollup for ${ru.basePaths.mkString(",")} is " +
            "STALE (base files changed since register) — skipping " +
            "rewrite; rebuild and re-register the summary")
          None
        } else rewriteWith(agg, filters, resolve, ru)
      }
    }
  }

  private def rewriteWith(agg: Aggregate, filters: Seq[Expression],
      resolve: Expression => Expression,
      ru: SummaryCatalog.Rollup): Option[Aggregate] = {
    val keySet = ru.keys.toSet
    def keysOnly(e: Expression): Boolean =
      e.deterministic && e.references.nonEmpty &&
        e.references.forall(a => keySet.contains(a.name))
    // every expression in BASE-column terms (through peeled Projects)
    val rGroup = agg.groupingExpressions.map(resolve)
    val rAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      ne =>
        resolve(ne) match {
          case n: NamedExpression => n
          // a bare output attribute that WAS a Project alias resolves
          // to the aliased expression — re-name it under the original
          // attribute's identity so parents keep resolving
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
    }
    // grouping keys: deterministic expressions over KEY columns only
    // (GROUP BY month(day_key) — grouping the finer summary by f(key)
    // merges exactly the base groups that share f(key), so every
    // decomposable partial re-aggregates to the base answer)
    if (!rGroup.forall(keysOnly)) return None
    // filters may only constrain key columns (they commute with the
    // rollup: a key predicate drops whole groups)
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
    // key attribute → the summary's matching column; a key column
    // missing from the summary aborts the whole rewrite (nonlocal
    // return — registration validates this, so it cannot fire)
    val mapAttrOrBail: PartialFunction[Expression, Expression] = {
      case a: AttributeReference if keySet.contains(a.name) =>
        s(a.name).getOrElse(return None)
    }

    def remapFn(fn: AggregateFunction): Option[Expression] = fn match {
      case Sum(a: AttributeReference, _) if ru.measures.contains(a.name) =>
        s(s"__sum_${a.name}").map(Sum(_).toAggregateExpression())
      case Min(a: AttributeReference) if ru.measures.contains(a.name) =>
        s(s"__min_${a.name}").map(Min(_).toAggregateExpression())
      case Max(a: AttributeReference) if ru.measures.contains(a.name) =>
        s(s"__max_${a.name}").map(Max(_).toAggregateExpression())
      // a key combination exists in the base iff its summary group row
      // does, and duplicates never change a MIN/MAX — so MIN/MAX of
      // any deterministic key EXPRESSION reads straight off the
      // summary (MIN(k), MAX(substr(k, 1, 4)), …)
      case Min(e) if keysOnly(e) =>
        Some(Min(e.transform(mapAttrOrBail)).toAggregateExpression())
      case Max(e) if keysOnly(e) =>
        Some(Max(e.transform(mapAttrOrBail)).toAggregateExpression())
      // COUNT(1)/COUNT('x') are row counts; COUNT(NULL) is NOT (it
      // must return 0), so null literals never match
      case Count(Seq(l: Literal)) if l.value != null =>
        s("__cnt").map(c =>
          Coalesce(Seq(Sum(c).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference))
          if ru.measures.contains(a.name) =>
        s(s"__cnt_${a.name}").map(c =>
          Coalesce(Seq(Sum(c).toAggregateExpression(), Literal(0L))))
      // COUNT(f(key)): rows where f(key) is non-null, re-weighted by
      // group size (a group where f evaluates null — including the
      // null-key group under null-strict f — contributes zero,
      // matching COUNT's null-skipping)
      case Count(Seq(e)) if keysOnly(e) =>
        s("__cnt").map(c =>
          Coalesce(Seq(
            Sum(If(IsNotNull(e.transform(mapAttrOrBail)), c, Literal(0L)))
              .toAggregateExpression(),
            Literal(0L))))
      // approx-distinct via mergeable DataSketches partials: the HLL
      // union of per-group sketches has the same register state as a
      // sketch built directly over the base (register max commutes
      // with grouping; sparse coupon lists union to the same set), so
      // hll_sketch_estimate over the union returns the IDENTICAL
      // estimate — the one "distinct over a measure" a rollup can
      // serve. lgK must match the registered sketch exactly.
      case HllSketchAgg(a: AttributeReference, lgk, _, _)
          if ru.sketchMeasures.contains(a.name) && lgk.foldable &&
            lgk.eval() == ru.lgK =>
        s(s"__hll_${a.name}").map(c =>
          HllUnionAgg(c, Literal(false)).toAggregateExpression())
      case _ => None
    }

    def remapAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(fn, Complete, false, None, _) => remapFn(fn)
      // COUNT(DISTINCT f(key)…) over KEY expressions only: the summary
      // has one row per distinct key combination, so the distinct
      // value set of any deterministic key derivation is identical
      // over the (tiny) summary. Null keys form their own summary row
      // and COUNT DISTINCT skips null tuples on both sides. Any child
      // referencing a measure refuses — partial measure aggregates
      // can never answer a distinct.
      case AggregateExpression(Count(children), Complete, true, None, _)
          if children.nonEmpty && children.forall(keysOnly) =>
        Some(Count(children.map(_.transform(mapAttrOrBail)))
          .toAggregateExpression(isDistinct = true))
      case _ => None
    }

    // Remap a full output expression tree: every contained
    // AggregateExpression goes through remapAgg (cast back to its
    // original result type — summing a decimal partial widens; the
    // cast restores the contract), every attribute OUTSIDE an
    // aggregate must be a key column, scalar structure is preserved
    // verbatim (Cast, arithmetic, hll_sketch_estimate, … evaluate
    // identically over exact re-aggregates). Manual recursion, not
    // transformDown: a transform would re-visit the freshly remapped
    // aggregates and refuse its own output.
    def remapTree(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression =>
        remapAgg(ae).map(r =>
          if (r.dataType == ae.dataType) r else Cast(r, ae.dataType))
      case a: AttributeReference =>
        if (keySet.contains(a.name)) s(a.name) else None
      case other =>
        val kids = other.children.map(remapTree)
        if (kids.exists(_.isEmpty)) None
        else if (kids.isEmpty) Some(other)
        else Some(other.withNewChildren(kids.map(_.get)))
    }
    val newAggExprs: Seq[NamedExpression] = rAggExprs.map {
      case a: AttributeReference if keySet.contains(a.name) =>
        s(a.name) match {
          case Some(sa) => Alias(sa, a.name)(exprId = a.exprId)
          case None     => return None
        }
      // bind the matched alias ITSELF (its exprId/dataType), never
      // re-find by name: duplicate output aliases are legal SQL
      // (SELECT sum(a) s, max(b) s) and a name lookup would hand the
      // second aggregate the first one's exprId and type.
      case al @ Alias(child, name) if child.deterministic =>
        remapTree(child) match {
          case Some(r) => Alias(r, name)(exprId = al.exprId)
          case None    => return None
        }
      case _ => return None
    }

    val newGroup = rGroup.map(_.transform(mapAttrOrBail))
    val newChild = filters.foldRight(summary) { (cond, child) =>
      Filter(cond.transform(mapAttrOrBail), child)
    }
    Some(Aggregate(newGroup, newAggExprs, newChild))
  }
}

/** Registry of materialized rollups, keyed by the base table's
  * file-source root paths. Process-wide (one engine per JVM here);
  * [[clear]] resets between tests. */
object SummaryCatalog {

  /** A registered rollup: the base table's root paths, its key and
    * measure column names, the sketch-measure columns (HLL partials
    * for approx-distinct, built at `lgK`), the ANALYZED logical plan
    * of the summary scan (a fresh instance is stamped per rewrite),
    * and the base's file fingerprint at registration time (the
    * staleness guard). */
  final case class Rollup(basePaths: Set[String], keys: Seq[String],
      measures: Seq[String], summaryPlan: LogicalPlan,
      baseFingerprint: Long, sketchMeasures: Seq[String] = Nil,
      lgK: Int = 12)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[Set[String], Rollup]()

  def isEmpty: Boolean = entries.isEmpty

  /** EXACT path-set match only: a scan over a strict subset of a
    * registered multi-path base (read(A) when read(A, B) was
    * registered) reads fewer rows than the rollup aggregated —
    * rewriting it would silently return rows from paths the query
    * never scanned. */
  private[plans] def lookup(paths: Set[String]): Option[Rollup] =
    Option(entries.get(paths))

  /** Order-independent hash of the scan's resolved file entries
    * (path, length, mtime): the SUM of per-entry hashes — addition
    * commutes, so no sort is needed and the cost is one linear pass
    * over a listing the scan's FileIndex has already materialized
    * (~tens of ms per optimization pass even at a million files).
    * Deliberately NOT memoized per FileIndex: InMemoryFileIndex
    * defines equality by root paths, so any map keyed on it would
    * hand a post-append scan the pre-append fingerprint and defeat
    * the staleness guard (the spec's stale-rollup case catches
    * exactly that). */
  private[plans] def fingerprint(fs: HadoopFsRelation): Long =
    fs.location.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .map(f => scala.util.hashing.MurmurHash3.stringHash(
        s"${f.getPath}:${f.getLen}:${f.getModificationTime}").toLong)
      .sum

  private def fileRelations(df: DataFrame): Seq[HadoopFsRelation] =
    df.queryExecution.analyzed.collect {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
    }

  /** Build the rollup convention from a base scan: one row per
    * distinct key combination carrying `__cnt` (row count) and
    * `__sum_/__min_/__max_/__cnt_` partials per measure. Materialize
    * this ONCE (write to parquet), then register the scan of the
    * materialized copy. */
  def buildSummary(base: DataFrame, keys: Seq[String],
      measures: Seq[String], sketchMeasures: Seq[String] = Nil,
      lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty,
      "rollup needs at least one key and one measure")
    require(keys.intersect(measures ++ sketchMeasures).isEmpty,
      s"keys and measures must be disjoint, both contain: " +
        keys.intersect(measures ++ sketchMeasures).mkString(", "))
    val aggs = count(lit(1)).as("__cnt") +:
      (measures.flatMap(m => Seq(
        sum(col(m)).as(s"__sum_$m"), min(col(m)).as(s"__min_$m"),
        max(col(m)).as(s"__max_$m"), count(col(m)).as(s"__cnt_$m"))) ++
        sketchMeasures.map(m =>
          hll_sketch_agg(col(m), lgK).as(s"__hll_$m")))
    base.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Incremental rollup maintenance: combine an EXISTING summary with
    * the rollup of an increment (the files appended since the summary
    * was built) into a new summary equal — bit-for-bit — to
    * [[buildSummary]] over the full base. This is why the rollup
    * stores decomposable partials only: sum of sums = total sum, min
    * of mins = total min, count of counts = total count, so a daily
    * refresh costs one scan of the DAY's data plus a keys-sized
    * re-aggregation of the old summary — never a re-scan of the
    * petabyte base. Flow after an append trips the staleness guard:
    * `combineSummaries(read(oldSummaryPath), buildSummary(newFiles,
    * keys, measures), keys, measures)` → write → [[register]] the
    * read-back.
    *
    * Combined columns are cast back to the inputs' column types, so
    * the refreshed summary's schema is STABLE across any number of
    * refreshes (summing a decimal partial widens precision; an
    * unchecked widening would drift the materialized schema and break
    * type equality with first-generation summaries). */
  def combineSummaries(oldSummary: DataFrame, increment: DataFrame,
      keys: Seq[String], measures: Seq[String],
      sketchMeasures: Seq[String] = Nil): DataFrame = {
    val expected = keys ++ Seq("__cnt") ++ measures.flatMap(m =>
      Seq(s"__sum_$m", s"__min_$m", s"__max_$m", s"__cnt_$m")) ++
      sketchMeasures.map(m => s"__hll_$m")
    Seq("old summary" -> oldSummary, "increment" -> increment)
      .foreach { case (which, df) =>
        val missing = expected.filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"$which is missing rollup columns: ${missing.mkString(", ")}")
      }
    val schema = oldSummary.schema.map(f => f.name -> f.dataType).toMap
    def c(name: String, agg: org.apache.spark.sql.Column) =
      agg.cast(schema(name)).as(name)
    val aggs = c("__cnt", sum(col("__cnt"))) +: (measures.flatMap(m =>
      Seq(c(s"__sum_$m", sum(col(s"__sum_$m"))),
        c(s"__min_$m", min(col(s"__min_$m"))),
        c(s"__max_$m", max(col(s"__max_$m"))),
        c(s"__cnt_$m", sum(col(s"__cnt_$m"))))) ++
      // HLL partials union losslessly (register max commutes), so a
      // refreshed summary's estimates stay identical to a rebuild
      sketchMeasures.map(m =>
        c(s"__hll_$m", hll_union_agg(col(s"__hll_$m"), false))))
    oldSummary.select(expected.map(col): _*)
      .unionByName(increment.select(expected.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Register `summary` (a MATERIALIZED scan — read back from its
    * parquet, not the live aggregation plan) as the rollup of `base`
    * over `keys`/`measures`. Subsequent aggregates on `base` whose
    * shape the rollup can answer are rewritten by [[SummaryRewrite]]
    * in every session carrying [[graft.functions.GraftExtensions]]. */
  def register(base: DataFrame, summary: DataFrame, keys: Seq[String],
      measures: Seq[String], sketchMeasures: Seq[String] = Nil,
      lgK: Int = 12): Unit = {
    require(keys.intersect(measures ++ sketchMeasures).isEmpty,
      s"keys and measures must be disjoint, both contain: " +
        keys.intersect(measures ++ sketchMeasures).mkString(", "))
    val baseRels = fileRelations(base)
    // exactly ONE relation: the rule matches a single scan node, so a
    // union-of-reads base could never be answered anyway — reject it
    // loudly instead of registering a rollup that never fires (a
    // multi-path read(A, B) is still one relation and is fine)
    require(baseRels.length == 1,
      s"base must be a single file-source scan (parquet/csv/json " +
        s"read), found ${baseRels.length} file relations")
    val baseRel = baseRels.head
    val basePaths = baseRel.location.rootPaths.map(_.toString).toSet
    require(basePaths.nonEmpty,
      "base must be a file-source scan (parquet/csv/json read)")
    val sumPaths =
      fileRelations(summary)
        .flatMap(_.location.rootPaths.map(_.toString)).toSet
    require(sumPaths.nonEmpty,
      "summary must be a MATERIALIZED file-source scan; register the " +
        "read of the written rollup, not the aggregation plan")
    require(basePaths.intersect(sumPaths).isEmpty,
      "summary cannot be the base table itself")
    val plan = summary.queryExecution.analyzed
    val out = plan.output.map(_.name).toSet
    val expected = keys ++ Seq("__cnt") ++ measures.flatMap(m =>
      Seq(s"__sum_$m", s"__min_$m", s"__max_$m", s"__cnt_$m")) ++
      sketchMeasures.map(m => s"__hll_$m")
    val missing = expected.filterNot(out.contains)
    require(missing.isEmpty,
      s"summary is missing rollup columns: ${missing.mkString(", ")} " +
        "(build it with SummaryCatalog.buildSummary)")
    entries.put(basePaths,
      Rollup(basePaths, keys, measures, plan, fingerprint(baseRel),
        sketchMeasures, lgK))
  }

  def clear(): Unit = entries.clear()
}
