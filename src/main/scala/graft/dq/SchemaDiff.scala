package graft.dq

import org.apache.spark.sql.types.{DataType, StructType}

/** Schema-drift report between an expected contract and an observed
  * batch — the decision input for [[graft.lake.Lake.appendEvolved]]:
  * additions are compatible (evolve the table), removals and retypes
  * are breaking (quarantine the batch, page someone). At 100 TB the
  * cheapest DQ check there is: schemas are metadata, no scan runs.
  */
object SchemaDiff {

  final case class Diff(
      added: Seq[(String, DataType)],     // in observed, not in expected
      removed: Seq[(String, DataType)],   // in expected, not in observed
      retyped: Seq[(String, DataType, DataType)]) { // (col, expected, observed)
    /** Additions are compatible; removals/retypes break readers. */
    def breaking: Boolean = removed.nonEmpty || retyped.nonEmpty
    def isEmpty: Boolean =
      added.isEmpty && removed.isEmpty && retyped.isEmpty
    def describe: String = {
      val parts =
        added.map { case (c, t) => s"+$c: ${t.simpleString}" } ++
        removed.map { case (c, t) => s"-$c: ${t.simpleString}" } ++
        retyped.map { case (c, e, o) =>
          s"~$c: ${e.simpleString} -> ${o.simpleString}" }
      if (parts.isEmpty) "schemas match" else parts.mkString(", ")
    }
  }

  /** Field comparison is case-insensitive on names (Spark's default
    * resolution) and structural on types. */
  def diff(expected: StructType, observed: StructType): Diff = {
    def byName(s: StructType) =
      s.fields.map(f => f.name.toLowerCase -> f).toMap
    val e = byName(expected); val o = byName(observed)
    val added = observed.fields.toSeq
      .filterNot(f => e.contains(f.name.toLowerCase))
      .map(f => f.name -> f.dataType)
    val removed = expected.fields.toSeq
      .filterNot(f => o.contains(f.name.toLowerCase))
      .map(f => f.name -> f.dataType)
    val retyped = expected.fields.toSeq.flatMap { f =>
      o.get(f.name.toLowerCase).collect {
        case of if of.dataType != f.dataType =>
          (f.name, f.dataType, of.dataType)
      }
    }
    Diff(added, removed, retyped)
  }

  /** Gate form: throws on breaking drift, returns the (possibly
    * additive) diff otherwise. */
  def requireCompatible(expected: StructType,
      observed: StructType): Diff = {
    val d = diff(expected, observed)
    require(!d.breaking,
      s"breaking schema drift: ${d.describe}")
    d
  }
}
