package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * CodegenFallback — every row pays interpreted lambda dispatch, which
  * dominates ANN/near-dup jobs that evaluate millions of cosines. These
  * expressions emit a tight primitive loop via `doGenCode`, keeping the
  * whole similarity stage inside whole-stage codegen.
  *
  * Semantics (shared by eval and codegen): null array → null; null/
  * missing elements contribute 0; dot runs over the common prefix,
  * norms over each full array; zero norm → 0.0.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  // inputs are guaranteed array<double> by the VectorFunctions call
  // sites (explicit cast); dataType is always double
  override def dataType: DataType = DoubleType
}

/** cosine(a, b) — cosine similarity of two double arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val m = math.max(nx, ny)
    var dot = 0.0; var sx = 0.0; var sy = 0.0
    var i = 0
    while (i < m) {
      val xi = if (i < nx && !x.isNullAt(i)) x.getDouble(i) else 0.0
      val yi = if (i < ny && !y.isNullAt(i)) y.getDouble(i) else 0.0
      dot += xi * yi; sx += xi * xi; sy += yi * yi
      i += 1
    }
    if (sx == 0.0 || sy == 0.0) 0.0 else dot / math.sqrt(sx * sy)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $m = Math.max($nx, $ny);
         |double $dot = 0.0, $sx = 0.0, $sy = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  double $xi = ($i < $nx && !$x.isNullAt($i)) ? $x.getDouble($i) : 0.0;
         |  double $yi = ($i < $ny && !$y.isNullAt($i)) ? $y.getDouble($i) : 0.0;
         |  $dot += $xi * $yi; $sx += $xi * $xi; $sy += $yi * $yi;
         |}
         |${ev.value} = ($sx == 0.0 || $sy == 0.0)
         |  ? 0.0 : $dot / Math.sqrt($sx * $sy);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** dot(a, b) — inner product over the common prefix of two double
  * arrays. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $dot += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** vec_sub(a, b) — elementwise difference over the common prefix of
  * two double arrays (the residual primitive for IVF-PQ: `zip_with`
  * would drop the whole indexing stage to interpreted eval). Exact
  * per-element IEEE subtraction — no accumulation, so the result is
  * engine-independent by construction. */
case class VectorSubtract(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $x.getDouble($i) - $y.getDouble($i);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
  override def prettyName: String = "vec_sub"
}

object VectorFunctions {
  private def toDouble(c: Column): Column = c.cast("array<double>")

  /** Column API for [[CosineSimilarity]]. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftSqlShims.column(CosineSimilarity(
      GraftSqlShims.expression(toDouble(a)),
      GraftSqlShims.expression(toDouble(b))))

  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProduct(
      GraftSqlShims.expression(toDouble(a)),
      GraftSqlShims.expression(toDouble(b))))

  /** Column API for [[VectorSubtract]]. */
  def vec_sub(a: Column, b: Column): Column =
    GraftSqlShims.column(VectorSubtract(
      GraftSqlShims.expression(toDouble(a)),
      GraftSqlShims.expression(toDouble(b))))

  /** SQL registration: `SELECT cosine_sim(a, b), dot_product(a, b)`.
    * Arguments are cast to array<double> here — the expressions read
    * double elements, and an uncast float vector straight off a parquet
    * scan would throw in the columnar reader. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType => AT, DoubleType => DT}
    def d(e: Expression): Expression = Cast(e, AT(DT))
    def two(name: String, exprs: Seq[Expression]): Unit =
      if (exprs.length != 2) throw new IllegalArgumentException(
        s"$name requires 2 arguments, got ${exprs.length}")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        two("cosine_sim", exprs); CosineSimilarity(d(exprs(0)), d(exprs(1)))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => {
        two("dot_product", exprs); DotProduct(d(exprs(0)), d(exprs(1)))
      }, "built-in")
  }
}
