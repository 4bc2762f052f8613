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

/** nearest_centroid(v, centroids) — argmax-by-cosine cell id of `v`
  * against a centroid MATRIX (array of k double arrays, normally a
  * literal). The one-expression replacement for the
  * `array_max(array(struct(cos, cell) × k))` formulation: that plan
  * carries k separate cosine subtrees (untenable past k ≈ 10², and the
  * reason assignments used to cap k), this is ONE codegen loop whose
  * cost is k·dim multiplies with no per-row struct materialization —
  * so the SemDeDup/IVF recipe "grow k with the corpus (k ≈ √n)"
  * actually holds at scale.
  *
  * Bit-compatible with the struct formulation (and the DuckDB oracle
  * replays): per-cell cosine is [[CosineSimilarity]]'s exact loop, and
  * the argmax mirrors Spark's (cos, cell) struct ordering — later cell
  * wins ties, NaN compares greatest, ±0.0 equal. Empty matrix → null.
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val k = cents.numElements()
    var bestCell = -1
    var best = 0.0
    var cell = 0
    while (cell < k) {
      val c = cents.getArray(cell)
      val nx = v.numElements(); val ny = c.numElements()
      val m = math.max(nx, ny)
      var dot = 0.0; var sx = 0.0; var sy = 0.0
      var i = 0
      while (i < m) {
        val xi = if (i < nx && !v.isNullAt(i)) v.getDouble(i) else 0.0
        val yi = if (i < ny && !c.isNullAt(i)) c.getDouble(i) else 0.0
        dot += xi * yi; sx += xi * xi; sy += yi * yi
        i += 1
      }
      val cos =
        if (sx == 0.0 || sy == 0.0) 0.0 else dot / math.sqrt(sx * sy)
      val take =
        if (bestCell < 0) true
        else if (java.lang.Double.isNaN(cos)) true
        else if (java.lang.Double.isNaN(best)) false
        else cos >= best
      if (take) { best = cos; bestCell = cell }
      cell += 1
    }
    if (bestCell < 0) null else bestCell
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val k = ctx.freshName("k"); val cell = ctx.freshName("cell")
      val c = ctx.freshName("c"); val bestCell = ctx.freshName("bestCell")
      val best = ctx.freshName("best"); val cos = ctx.freshName("cos")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val m = ctx.freshName("m"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val take = ctx.freshName("take")
      s"""
         |int $k = $cents.numElements();
         |int $bestCell = -1;
         |double $best = 0.0;
         |for (int $cell = 0; $cell < $k; $cell++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c =
         |    $cents.getArray($cell);
         |  int $nx = $v.numElements();
         |  int $ny = $c.numElements();
         |  int $m = Math.max($nx, $ny);
         |  double $dot = 0.0, $sx = 0.0, $sy = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $xi = ($i < $nx && !$v.isNullAt($i))
         |      ? $v.getDouble($i) : 0.0;
         |    double $yi = ($i < $ny && !$c.isNullAt($i))
         |      ? $c.getDouble($i) : 0.0;
         |    $dot += $xi * $yi; $sx += $xi * $xi; $sy += $yi * $yi;
         |  }
         |  double $cos = ($sx == 0.0 || $sy == 0.0)
         |    ? 0.0 : $dot / Math.sqrt($sx * $sy);
         |  boolean $take;
         |  if ($bestCell < 0) $take = true;
         |  else if (Double.isNaN($cos)) $take = true;
         |  else if (Double.isNaN($best)) $take = false;
         |  else $take = $cos >= $best;
         |  if ($take) { $best = $cos; $bestCell = $cell; }
         |}
         |if ($bestCell < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $bestCell; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
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

  /** Column API for [[NearestCentroid]]. `centroids` is normally a
    * `typedLit(Seq[Seq[Double]])` matrix. */
  def nearest_centroid(v: Column, centroids: Column): Column =
    GraftSqlShims.column(NearestCentroid(
      GraftSqlShims.expression(toDouble(v)),
      GraftSqlShims.expression(centroids.cast("array<array<double>>"))))

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
