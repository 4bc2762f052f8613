package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.types.{IntegerType, StringType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** edit_probe_segments(s, k, allowedLens) — the fused probe-side
  * substring emitter for [[graft.operators.EditJoin]]: one generator
  * row per DISTINCT (segIdx, assumedLen, segment) triple of the
  * PassJoin probe enumeration — for each segment index `i ∈ [0, k]`,
  * each assumed build length `l1 ∈ [max(|s|−k, k+1), |s|+k]`
  * (optionally restricted to the observed build lengths), every
  * substring of `s` whose 1-based start sits within ±k of the
  * canonical segment-`i` position under length `l1`, windows falling
  * off either end skipped.
  *
  * Semantically identical to the former expression tree
  * (`flatten(flatten(transform(... transform(... filter(transform(...`
  * + `array_distinct` + `explode`) — EditJoinSpec's brute-force
  * parity and the candidate-count pins hold unchanged — but it runs
  * as ONE compiled per-row loop instead of (k+1)·(2k+1)² interpreted
  * higher-order-function lambda invocations building five levels of
  * intermediate arrays per row (Catalyst HOFs evaluate their lambdas
  * interpreted, outside whole-stage codegen). Position/length
  * arithmetic is in CODE POINTS via `UTF8String.substringSQL`, the
  * unit `substring`/`levenshtein`/[[FirstSegMatch]] count in; the
  * ceil-first segment split `st(i) = (i·l1 + k) div (k+1)` is
  * byte-identical to the build side's.
  *
  * `allowedLens` mirrors the probe-side IN-list prune: assumed
  * lengths no build string has can never equi-join — when the build
  * corpus's distinct lengths fit the 64-value pull the enumeration
  * skips every other `l1` before any substring is cut.
  */
case class EditProbeSegments(child: Expression, k: Int,
    allowedLens: Option[Seq[Int]])
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"k must be >= 1, got $k")

  override def elementSchema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("l1", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false)))

  override def prettyName: String = "edit_probe_segments"

  @transient private lazy val lenSet: java.util.HashSet[Int] =
    allowedLens.map { ls =>
      val s = new java.util.HashSet[Int](ls.size * 2)
      ls.foreach(s.add)
      s
    }.orNull

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val sAny = child.eval(input)
    if (sAny == null) return Nil
    val s = sAny.asInstanceOf[UTF8String]
    val n = k + 1
    val l = s.numChars()
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    // per-(i, l1) window: only the q loop can repeat a segment text,
    // so dedup (the former array_distinct) is a ≤ (2k+1)-entry set
    val seen = new java.util.HashSet[UTF8String](2 * (2 * k + 1))
    var i = 0
    while (i <= k) {
      var l1 = math.max(l - k, n)
      val l1Max = l + k
      while (l1 <= l1Max) {
        if (lenSet == null || lenSet.contains(l1)) {
          seen.clear()
          // st(i) = ceil(i·l1/n), identical to the build side's split
          val st = (i.toLong * l1 + k) / n
          val st1 = ((i + 1).toLong * l1 + k) / n
          val len = (st1 - st).toInt
          var q = st.toInt + 1 - k
          val qMax = st.toInt + 1 + k
          while (q <= qMax) {
            if (q >= 1 && q + len - 1 <= l) {
              val seg = s.substringSQL(q, len)
              if (seen.add(seg))
                out += InternalRow(i, l1, seg)
            }
            q += 1
          }
        }
        l1 += 1
      }
      i += 1
    }
    out
  }

  override def terminate(): IterableOnce[InternalRow] = Nil

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object EditProbeSegments {
  /** Column API: three output columns (i, l1, seg). */
  def edit_probe_segments(s: Column, k: Int,
      allowedLens: Option[Seq[Int]]): Column =
    GraftSqlShims.column(EditProbeSegments(
      GraftSqlShims.expression(s), k, allowedLens.map(_.sorted)))
}
