package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage: which SOURCE table columns feed each output
  * column of a DataFrame. Walks the ANALYZED logical plan (the user's
  * structure, before optimizer rewrites) propagating attribute origins
  * bottom-up through projections, aggregations, windows, generators,
  * expands, and unions; joins/filters/sorts pass attributes through
  * unchanged.
  *
  * The impact-analysis primitive a warehouse needs at any scale:
  * "which raw columns feed this BI metric" (forward audit) and "which
  * reports break if this source column changes" (inverse — see
  * [[dependents]]). Pure plan analysis: nothing is executed and no
  * data is read.
  */
object Lineage {

  /** Map each output column name of `df` to the set of "table.column"
    * source fields it derives from (empty set = constant/synthetic). */
  def columnOrigins(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = attrSources(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String]))
      .toMap
  }

  /** Inverse lineage over a set of frames: for one source field
    * "table.column", every (frameName, outputColumn) that depends on
    * it. */
  def dependents(frames: Map[String, DataFrame],
      sourceField: String): Seq[(String, String)] =
    frames.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      columnOrigins(df).collect {
        case (out, srcs) if srcs.contains(sourceField) => name -> out
      }
    }

  private def leafLabel(l: LeafNode): String = l match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).getOrElse(lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .map(_.getName.replaceAll("\\.[A-Za-z0-9]+$", ""))
            .getOrElse("relation")
        case other => other.getClass.getSimpleName
      })
    case _: LocalRelation => "local"
    case other => other.nodeName
  }

  private def fromNamed(nes: Seq[NamedExpression],
      child: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    nes.map(ne => ne.exprId -> ne.references.toSeq
      .flatMap(r => child.getOrElse(r.exprId, Set.empty[String])).toSet)
      .toMap

  private def attrSources(plan: LogicalPlan): Map[ExprId, Set[String]] =
    plan match {
      case l: LeafNode =>
        val label = leafLabel(l)
        l.output.map(a => a.exprId -> Set(s"$label.${a.name}")).toMap
      case u: Union =>
        // union output reuses the first child's exprIds; origin of
        // position i is the union of every child's position-i origins
        val childMaps = u.children.map(attrSources)
        val outs = u.children.map(_.output)
        val merged = u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> outs.indices.flatMap(c =>
            childMaps(c).getOrElse(outs(c)(i).exprId, Set.empty[String]))
            .toSet
        }.toMap
        childMaps.fold(Map.empty[ExprId, Set[String]])(_ ++ _) ++ merged
      case p =>
        val child = p.children.map(attrSources)
          .fold(Map.empty[ExprId, Set[String]])(_ ++ _)
        val extra: Map[ExprId, Set[String]] = p match {
          case Project(exprs, _) => fromNamed(exprs, child)
          case a: Aggregate => fromNamed(a.aggregateExpressions, child)
          case w: Window => fromNamed(w.windowExpressions, child)
          case g: Generate =>
            val srcs = g.generator.references.toSeq
              .flatMap(r => child.getOrElse(r.exprId, Set.empty[String]))
              .toSet
            g.generatorOutput.map(a => a.exprId -> srcs).toMap
          case e: Expand =>
            e.output.zipWithIndex.map { case (a, i) =>
              a.exprId -> e.projections.flatMap(proj =>
                proj(i).references.toSeq.flatMap(r =>
                  child.getOrElse(r.exprId, Set.empty[String]))).toSet
            }.toMap
          case _ => Map.empty
        }
        child ++ extra
    }
}
