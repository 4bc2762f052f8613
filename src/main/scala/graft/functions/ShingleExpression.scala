package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** shingle_hashes(words, n) — distinct 64-bit hashes of the word
  * n-gram shingles of a tokenized document, without ever materializing
  * a shingle string.
  *
  * The composable form (`transform(sequence(...), i -> concat_ws(' ',
  * slice(words, i, n)))` + `array_distinct` + `xxhash64`) allocates a
  * string per shingle and walks interpreted lambdas — it was 6s of a
  * 10s dedup job on a 5k-doc corpus. Here each word is hashed once
  * (over its UTF8 bytes, no copying), each window folds n word-hashes
  * with a splitmix64 finisher, and dedup happens in a primitive-sorted
  * array. Codegen emits a call to the compiled [[ShingleHashesUtil]]
  * loop, so the surrounding stage stays in whole-stage codegen.
  */
object ShingleHashesUtil {
  /** Order-sensitive fold of one word-hash into a running shingle
    * hash, splitmix64-finished at the end. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Compute distinct shingle hashes; returns an ArrayData of longs.
    * Public + JVM-static-shaped so generated code can call it. */
  def compute(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    if (nw < n) return new GenericArrayData(Array.emptyLongArray)
    // hash every word once over its UTF8 bytes
    val wh = new Array[Long](nw)
    var i = 0
    while (i < nw) {
      val w = words.getUTF8String(i)
      wh(i) =
        if (w == null) 0L
        else {
          // two 32-bit murmur passes with different seeds → 64 bits
          val lo = Murmur3_x86_32.hashUnsafeBytes(
            w.getBaseObject, w.getBaseOffset, w.numBytes, 42)
          val hi = Murmur3_x86_32.hashUnsafeBytes(
            w.getBaseObject, w.getBaseOffset, w.numBytes, 0x7f4a7c15)
          (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        }
      i += 1
    }
    val out = new Array[Long](nw - n + 1)
    i = 0
    while (i <= nw - n) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) { h = mix(h * 0x100000001b3L + wh(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    // distinct via sort + squash (no boxing)
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < out.length) {
      if (uniq == 0 || out(i) != out(uniq - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
}

case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashesUtil.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words =>
      s"${ev.value} = graft.functions.ShingleHashesUtil.compute($words, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  /** Column API: input is the tokenized words array (array<string>). */
  def shingle_hashes(words: Column, n: Int): Column =
    GraftSqlShims.column(
      ShingleHashes(GraftSqlShims.expression(words), n))
}
