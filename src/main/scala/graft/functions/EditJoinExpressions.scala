package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** first_seg_match(sa, sb, k) — the PassJoin candidate-dedup kernel
  * for [[graft.operators.EditJoin]]: the SMALLEST segment index
  * `i ∈ [0, k]` such that segment `i` of `sa` (ceil-first partition
  * into `k+1` contiguous segments, the exact split EditJoin's build
  * side emits) occurs verbatim inside `sb` at a 1-based start
  * position within `±k` of its canonical position (the exact window
  * EditJoin's probe side enumerates); `-1` when no segment matches.
  *
  * A candidate pair produced via segment index `__i` is the pair's
  * FIRST (hence only-emitted) candidate iff
  * `__i = first_seg_match(sa, sb, k)` — this one compact comparison
  * replaces an output-sized `distinct()`.
  *
  * Why a native expression and not the equivalent unrolled
  * substring-comparison predicate: the unrolled form inflates the
  * join-condition method the pair join compiles past the JIT's
  * huge-method bytecode limit, silently de-optimizing the ENTIRE
  * join stage (including the banded levenshtein residual) to
  * interpreted bytecode — measured 3.8× end-to-end on the k=2 scale
  * fixture. This expression is one static call in the generated
  * code; the loops run as compiled Scala either way (eval and
  * codegen share [[FirstSegMatch.firstMatch]]).
  *
  * Position/length arithmetic is in CODE POINTS via
  * `UTF8String.substringSQL` — the same unit Spark's `substring`
  * (probe generation) and `levenshtein` (verification) count in.
  */
case class FirstSegMatch(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_seg_match"

  override def nullSafeEval(sa: Any, sb: Any): Any =
    FirstSegMatch.firstMatch(sa.asInstanceOf[UTF8String],
      sb.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sa, sb) =>
      s"${ev.value} = graft.functions.FirstSegMatch.firstMatch($sa, $sb, $k);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight, k)
}

object FirstSegMatch {

  /** Shared by interpreted eval and generated code. `sa` is the build
    * string (its own length is the assumed length `l1` — EditJoin's
    * candidate join equates them), `sb` the probe string. */
  def firstMatch(sa: UTF8String, sb: UTF8String, k: Int): Int = {
    val n = k + 1
    val l = sa.numChars()
    val lb = sb.numChars()
    var i = 0
    while (i <= k) {
      // st(i) = ceil(i*l/n) — identical to the SQL `(i*l + k) div n`
      // the build/probe sides compute
      val st = (i.toLong * l + k) / n
      val st1 = ((i + 1).toLong * l + k) / n
      val len = (st1 - st).toInt
      if (len > 0) {
        val seg = sa.substringSQL(st.toInt + 1, len)
        var o = -k
        while (o <= k) {
          val q = st.toInt + 1 + o
          if (q >= 1 && q + len - 1 <= lb &&
            sb.substringSQL(q, len).equals(seg)) return i
          o += 1
        }
      }
      i += 1
    }
    -1
  }

  /** Column API. */
  def first_seg_match(sa: Column, sb: Column, k: Int): Column =
    GraftSqlShims.column(FirstSegMatch(
      GraftSqlShims.expression(sa), GraftSqlShims.expression(sb), k))
}
