package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** bpe_segment_words(words, merges) — apply a BPE merge table to an
  * array of words, emitting the flattened subword stream.
  *
  * The composable formulation ([[graft.text.Bpe.segment]]'s nested
  * `aggregate` folds) is correct but allocation-bound: `concat(acc,
  * array(x))` copies the accumulator PER CHARACTER, so one word costs
  * O(len²) array copies per merge, times interpreted lambda dispatch —
  * measured ~140 µs/doc at the ×100 scale run (SCALING.md). This
  * expression runs the same greedy fold as ONE in-place buffer pass
  * per merge (O(len) per merge, zero lambda dispatch) shared verbatim
  * by eval and codegen via [[BpeSegmentWords.segmentAll]] — the
  * generated code stays inside whole-stage codegen and calls the
  * static helper, the same shape as UnsafeArrayData.fromPrimitiveArray
  * in the other vector expressions.
  *
  * Exact-equivalence contract with the fold formulation (pinned by
  * BpeSpec property tests): words split to CODE POINTS (what Spark's
  * `split(w, "")` produces), each merge applies greedily
  * left-to-right non-overlapping, merges in table order. The merge
  * table must be FOLDABLE (a literal — the pretrained-tokenizer
  * shape); it is parsed once per operator, not per row.
  */
case class BpeSegmentWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  // a null ELEMENT in the words array yields a null result (flatten
  // semantics) even when the array itself is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "bpe_segment_words"

  // the merge table literal, parsed once: [ [l, r, lr], ... ]
  @transient private lazy val table: Array[Array[UTF8String]] = {
    require(right.foldable,
      "bpe_segment_words: the merge table must be a literal")
    val arr = right.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val pair = arr.getArray(i)
      require(pair.numElements() == 2,
        s"merge entry $i must be [left, right]")
      val l = pair.getUTF8String(0).clone()
      val r = pair.getUTF8String(1).clone()
      Array(l, r, UTF8String.concat(l, r))
    }.toArray
  }

  override def nullSafeEval(words: Any, mergesIgnored: Any): Any =
    BpeSegmentWords.segmentAll(words.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, (words, _) =>
      s"""
         |${ev.value} = graft.functions.BpeSegmentWords
         |  .segmentAll($words, $tableRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object BpeSegmentWords {

  /** Shared by interpreted eval and generated code — one
    * implementation, bit-identical results. A null WORD yields a null
    * result (the composable twin's semantics: `flatten` over an array
    * with a null element is null), rather than an NPE from a
    * SQL-registered call on dirty data. */
  def segmentAll(words: ArrayData,
      merges: Array[Array[UTF8String]]): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      if (words.isNullAt(wi)) return null
      val w = words.getUTF8String(wi)
      // split to code points (split(w, "") semantics)
      var syms = toCodePoints(w)
      var mi = 0
      while (mi < merges.length) {
        syms = applyMerge(syms, merges(mi))
        mi += 1
      }
      var si = 0
      while (si < syms.length) { out.add(syms(si)); si += 1 }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def toCodePoints(w: UTF8String): Array[UTF8String] = {
    val s = w.toString
    // split("", "") yields [""] — the empty word contributes one empty
    // symbol, matching the composable twin exactly (it never merges:
    // merge sides are non-empty by construction)
    if (s.isEmpty) return Array(UTF8String.EMPTY_UTF8)
    val out = new java.util.ArrayList[UTF8String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val len = Character.charCount(cp)
      out.add(UTF8String.fromString(s.substring(i, i + len)))
      i += len
    }
    out.toArray(new Array[UTF8String](out.size()))
  }

  /** [[BpeApplyMerge]]'s entry: one merge pass over an ArrayData of
    * symbols. */
  def applyMergeData(syms: ArrayData,
      m: Array[UTF8String]): ArrayData = {
    val n = syms.numElements()
    val in = new Array[UTF8String](n)
    var i = 0
    while (i < n) { in(i) = syms.getUTF8String(i); i += 1 }
    new GenericArrayData(
      applyMerge(in, m).asInstanceOf[Array[AnyRef]])
  }

  /** One greedy left-to-right non-overlapping pass — the exact
    * semantics of [[graft.text.Bpe.applyMerge]]'s fold, O(len) with
    * no per-step copies. Null symbols pass through unmerged (the
    * fold's when/otherwise does the same: a null comparison falls to
    * the append branch). */
  private def applyMerge(syms: Array[UTF8String],
      m: Array[UTF8String]): Array[UTF8String] = {
    val out = new java.util.ArrayList[UTF8String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && m(0).equals(syms(i)) &&
          m(1).equals(syms(i + 1))) {
        out.add(m(2)); i += 2
      } else { out.add(syms(i)); i += 1 }
    }
    out.toArray(new Array[UTF8String](out.size()))
  }
}

/** bpe_apply_merge(syms, [l, r]) — ONE greedy merge pass over a
  * symbol array (the training-loop primitive: each Lloyd-style round
  * applies the round's winning pair to every distinct word's symbol
  * array). Same in-place buffer pass as [[BpeSegmentWords]], same
  * fold semantics as [[graft.text.Bpe.applyMerge]]'s composable twin. */
case class BpeApplyMerge(left: Expression, right: Expression)
    extends BinaryExpression {

  // null symbols pass through unmerged (the composable fold appends
  // them), so the output can carry nulls when the input does
  override def dataType: DataType =
    ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_apply_merge"

  @transient private lazy val merge: Array[UTF8String] = {
    require(right.foldable,
      "bpe_apply_merge: the merge pair must be a literal")
    val pair = right.eval().asInstanceOf[ArrayData]
    require(pair.numElements() == 2, "merge must be [left, right]")
    val l = pair.getUTF8String(0).clone()
    val r = pair.getUTF8String(1).clone()
    Array(l, r, UTF8String.concat(l, r))
  }

  override def nullSafeEval(syms: Any, mergeIgnored: Any): Any =
    BpeSegmentWords.applyMergeData(syms.asInstanceOf[ArrayData], merge)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mergeRef = ctx.addReferenceObj("bpeMerge", merge,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (syms, _) =>
      s"""
         |${ev.value} = graft.functions.BpeSegmentWords
         |  .applyMergeData($syms, $mergeRef);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object BpeFunctions {
  /** Column API for [[BpeSegmentWords]]: `merges` as a literal
    * `Seq[Seq[String]]` of [left, right] pairs in rank order. */
  def bpe_segment_words(words: Column,
      merges: Seq[(String, String)]): Column =
    GraftSqlShims.column(BpeSegmentWords(
      GraftSqlShims.expression(words),
      GraftSqlShims.expression(org.apache.spark.sql.functions
        .typedLit(merges.map(m => Seq(m._1, m._2))))))

  /** Column API for [[BpeApplyMerge]]. */
  def bpe_apply_merge(syms: Column, l: String, r: String): Column =
    GraftSqlShims.column(BpeApplyMerge(
      GraftSqlShims.expression(syms),
      GraftSqlShims.expression(org.apache.spark.sql.functions
        .typedLit(Seq(l, r)))))
}
