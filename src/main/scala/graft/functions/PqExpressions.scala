package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for product quantization
  * ([[graft.similarity.Pq]]).
  *
  * The composed-Column formulation of PQ encoding inlines
  * m×ksub×dsub (= 2048 at the defaults) arithmetic sub-expressions
  * into one projection — past Janino's 64 KB method limit, so the
  * whole stage fell back to interpreted evaluation. These expressions
  * emit the same arithmetic as three short loops over a codebook
  * reference object, keeping encode/LUT inside whole-stage codegen.
  *
  * Numeric contract (what the q_ann_pq oracle replays bit-for-bit):
  * each squared-L2 accumulates `acc += diff*diff` from 0.0 in element
  * order — the identical left-associated `0.0 + t1 + t2 + …` fold the
  * SQL oracle writes out; argmin keeps the LOWEST cell on ties
  * (strict `<` against the running best). The codebook rides the
  * expression as a `double[][][]` reference — never serialized into
  * generated source.
  */
abstract class PqCodebookExpression extends UnaryExpression {
  def codebooks: Seq[Seq[Seq[Double]]]

  protected lazy val cb: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  protected def m: Int = cb.length
  protected def ksub: Int = cb(0).length
  protected def dsub: Int = cb(0)(0).length
}

/** pq_encode(v) — the m nearest-sub-centroid codes of a double
  * vector, as array<int>. */
case class PqEncode(child: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends PqCodebookExpression {

  override def dataType: DataType = ArrayType(IntegerType,
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity; var bestC = 0
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(s * dsub + d) - cb(s)(c)(d)
          acc += diff * diff
          d += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      s"""
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $v.getDouble($s * $dsub + $d)
         |        - $cbRef[$s][$c][$d];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestC = $c; }
         |  }
         |  $codes[$s] = $bestC;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

/** pq_lut(v) — the ADC lookup table of a query vector: lut[s][c] =
  * squared L2 from the query's subspace-s slice to sub-centroid c, as
  * array<array<double>>. */
case class PqLut(child: Expression,
    codebooks: Seq[Seq[Seq[Double]]]) extends PqCodebookExpression {

  override def dataType: DataType = ArrayType(
    ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val rows = new Array[Any](m)
    var s = 0
    while (s < m) {
      val row = new Array[Double](ksub)
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(s * dsub + d) - cb(s)(c)(d)
          acc += diff * diff
          d += 1
        }
        row(c) = acc
        c += 1
      }
      rows(s) = UnsafeArrayData.fromPrimitiveArray(row)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "double[][][]")
      val rows = ctx.freshName("rows")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      s"""
         |Object[] $rows = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[] $row = new double[$ksub];
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      double $diff = $v.getDouble($s * $dsub + $d)
         |        - $cbRef[$s][$c][$d];
         |      $acc += $diff * $diff;
         |    }
         |    $row[$c] = $acc;
         |  }
         |  $rows[$s] = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util
         |  .GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_lut"
}

object PqFunctions {
  private def toDouble(c: Column): Column = c.cast("array<double>")

  def pq_encode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlShims.column(PqEncode(
      GraftSqlShims.expression(toDouble(v)), codebooks))

  def pq_lut(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlShims.column(PqLut(
      GraftSqlShims.expression(toDouble(v)), codebooks))
}
