package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** SparkSessionExtensions hook registering the engine's native
  * expressions for SQL use — the idiomatic deployment path:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)        // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * After which `SELECT cosine_sim(a, b)`, `dot_product(a, b)`,
  * `minhash_sig(hashes, k)`, `shingle_hashes(words, n)` work in any
  * SQL context of the session (views, spark.sql, thrift server).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def d(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name requires $n arguments, got ${exprs.length}")

  /** Resolution-time check that an argument is a foldable integer
    * (e.g. `k` in minhash_sig(hashes, k)): evaluating a non-foldable
    * expression here would surface as an internal unbound-reference
    * error — fail with a clear analysis error instead. */
  private def foldableInt(fn: String, param: String, e: Expression): Int = {
    if (!e.foldable) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map("funcName" -> s"`$fn`",
        "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
    e.eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $param must be an integer literal, got $other")
    }
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: naive bounded time-range joins → band equi-joins
    // (the automatic form of Temporal.boundedGapSelfJoin's rewrite)
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    // optimizer rule: aggregates over a registered base table answered
    // from its materialized rollup (SummaryCatalog.register)
    e.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity"),
      (exprs: Seq[Expression]) => {
        arity("cosine_sim", 2, exprs)
        CosineSimilarity(d(exprs(0)), d(exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - inner product"),
      (exprs: Seq[Expression]) => {
        arity("dot_product", 2, exprs)
        DotProduct(d(exprs(0)), d(exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("vec_sub"),
      info("vec_sub", "vec_sub(a, b) - elementwise difference"),
      (exprs: Seq[Expression]) => {
        arity("vec_sub", 2, exprs)
        VectorSubtract(d(exprs(0)), d(exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("nearest_centroid"),
      info("nearest_centroid",
        "nearest_centroid(v, centroids) - argmax-by-cosine cell id"),
      (exprs: Seq[Expression]) => {
        arity("nearest_centroid", 2, exprs)
        NearestCentroid(d(exprs(0)),
          Cast(exprs(1), ArrayType(ArrayType(DoubleType))))
      }))
    e.injectFunction((FunctionIdentifier("hash_embed"),
      info("hash_embed",
        "hash_embed(tokens, dim) - feature-hashed bag-of-words vector"),
      (exprs: Seq[Expression]) => {
        arity("hash_embed", 2, exprs)
        HashEmbedTokens(Cast(exprs(0), ArrayType(StringType)), exprs(1))
      }))
    e.injectFunction((FunctionIdentifier("bpe_segment_words"),
      info("bpe_segment_words",
        "bpe_segment_words(words, merges) - BPE subword stream"),
      (exprs: Seq[Expression]) => {
        arity("bpe_segment_words", 2, exprs)
        BpeSegmentWords(Cast(exprs(0), ArrayType(StringType)),
          Cast(exprs(1), ArrayType(ArrayType(StringType))))
      }))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes, k) - MinHash signature"),
      (exprs: Seq[Expression]) => {
        arity("minhash_sig", 2, exprs)
        MinHashSignature(Cast(exprs(0), ArrayType(LongType)),
          foldableInt("minhash_sig", "k", exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(words, n) - word n-gram hashes"),
      (exprs: Seq[Expression]) => {
        arity("shingle_hashes", 2, exprs)
        ShingleHashes(exprs(0),
          foldableInt("shingle_hashes", "n", exprs(1)))
      }))
    // z_value is registered as a RAW catalyst expression tree (shifts/
    // masks) — a Column composed of sql.functions builders cannot be
    // returned from a function builder (its ColumnNode wrapper never
    // re-enters analysis), so SQL registration is reserved for
    // functions expressible directly in catalyst nodes.
    e.injectFunction((FunctionIdentifier("z_value"),
      info("z_value",
        "z_value(a, b) - Morton bit-interleave of two 16-bit ranks"),
      (exprs: Seq[Expression]) => {
        arity("z_value", 2, exprs)
        import org.apache.spark.sql.catalyst.expressions.{
          BitwiseAnd, BitwiseOr, Literal, ShiftLeft, ShiftRightUnsigned}
        val terms = for {
          (arg, j) <- exprs.take(2).zipWithIndex
          i <- 0 until 16
        } yield ShiftLeft(
          BitwiseAnd(
            ShiftRightUnsigned(Cast(arg, LongType), Literal(i)),
            Literal(1L)),
          Literal(i * 2 + j))
        terms.reduce[Expression](BitwiseOr(_, _))
      }))
    // the KMV sketch family's aggregates are raw TypedImperativeAggregate
    // nodes, so they register directly (the analyzer wraps an
    // AggregateFunction in its AggregateExpression); the scalar algebra
    // (kmv_estimate/union/jaccard/sample_quantile) is built from Column
    // builders and stays Scala-API-only, same boundary as documented at
    // z_value above
    e.injectFunction((FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct",
        "kmv_distinct(h, k) - KMV distinct-count estimate over a " +
          "48-bit uniform hash"),
      (exprs: Seq[Expression]) => {
        arity("kmv_distinct", 2, exprs)
        KMinValues(exprs(0), foldableInt("kmv_distinct", "k", exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("kmv_sketch"),
      info("kmv_sketch",
        "kmv_sketch(h, k) - the k smallest distinct hashes, mergeable"),
      (exprs: Seq[Expression]) => {
        arity("kmv_sketch", 2, exprs)
        KMinValuesSketch(exprs(0),
          foldableInt("kmv_sketch", "k", exprs(1)))
      }))
    e.injectFunction((FunctionIdentifier("kmv_sample"),
      info("kmv_sample",
        "kmv_sample(h, v, k) - bottom-k-by-hash order sample of v"),
      (exprs: Seq[Expression]) => {
        arity("kmv_sample", 3, exprs)
        KMinValuesSample(exprs(0), exprs(1),
          foldableInt("kmv_sample", "k", exprs(2)))
      }))
  }
}
