package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** simhash64(tokens) — the 64-bit SimHash of a token array in ONE fused
  * loop: per-token FNV-1a 64 over UTF-16 code units, 64 bit-votes, then
  * the sign-vote fold. An empty token array hashes to 0L (the "no
  * content" fingerprint the dedup pipeline expects).
  *
  * This replaces the last hot-path Scala UDF in the dedup family
  * ([[graft.dedup.Dedup.simHashPairs]]): a UDF pays per-row
  * encoder/dispatch overhead that a codegen'd expression doesn't, and
  * at 10^10 documents that difference dominates the signature stage.
  * The hash recipe is pinned bit-for-bit by the DuckDB oracle of
  * `q_dedup_simhash` (queries/ExtensionQueries.scala), which replays
  * the same FNV-1a + bit-vote construction in SQL.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t).toString
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val t = ctx.freshName("t"); val s = ctx.freshName("s")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $n; $t++) {
         |  String $s = $arr.getUTF8String($t).toString();
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $i = 0; $i < $s.length(); $i++) {
         |    $h ^= (long) $s.charAt($i);
         |    $h *= 0x100000001b3L;
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFunctions {
  /** Column API for [[SimHash64]] — input must be array<string>
    * (e.g. TextAnalysis.tokens). Null tokens arrays propagate null;
    * wrap in coalesce(_, lit(0L)) where the UDF's null→0 contract is
    * needed. */
  def simhash64(tokens: Column): Column =
    GraftSqlShims.column(SimHash64(GraftSqlShims.expression(tokens)))
}
