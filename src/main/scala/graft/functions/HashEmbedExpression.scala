package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** hash_embed(tokens, dim) — feature-hashed bag-of-words embedding:
  * each token buckets by the portable base-31 polynomial hash mod
  * `dim`, the vector is the bucket-count histogram as doubles.
  *
  * The composable formulation ([[graft.text.Retrieval.hashEmbed]]'s
  * `transform`/`filter` HOFs) recomputes the bucket comparison dim
  * times per token under interpreted lambda dispatch — ~260 µs/doc at
  * the ×100 scale run. This is ONE pass per token into a primitive
  * histogram, shared verbatim by eval and codegen via
  * [[HashEmbed.embed]]. Hash semantics are EXACTLY the composable
  * form's (code-point polynomial `h = (h*31 + cp) mod 1e9+7`, bucket
  * `h mod dim`), so the DuckDB oracle replay is unchanged; the
  * equivalence is property-pinned in RetrievalSpec.
  */
case class HashEmbedTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hash_embed"

  @transient private lazy val dim: Int = {
    require(right.foldable, "hash_embed: dim must be a literal")
    val d = right.eval().asInstanceOf[Number].intValue()
    require(d > 0, s"hash_embed: dim must be positive, got $d")
    d
  }

  override def nullSafeEval(toks: Any, dimIgnored: Any): Any =
    HashEmbed.embed(toks.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) =>
      s"""
         |${ev.value} = graft.functions.HashEmbed.embed($toks, $dim);
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object HashEmbed {

  /** Shared by interpreted eval and generated code. Null tokens
    * count toward no bucket — the composable twin's semantics (a null
    * token's bucket is null, matching no histogram slot). */
  def embed(toks: ArrayData, dim: Int): ArrayData = {
    val hist = new Array[Double](dim)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 31L + cp) % 1000000007L
          j += Character.charCount(cp)
        }
        hist((h % dim).toInt) += 1.0
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(hist)
  }

  /** Column API. */
  def hash_embed(toks: Column, dim: Int): Column =
    GraftSqlShims.column(HashEmbedTokens(
      GraftSqlShims.expression(toks),
      GraftSqlShims.expression(
        org.apache.spark.sql.functions.lit(dim))))
}
