package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast (it's small by construction); the
  *    corpus is scanned once, cosines computed in codegen'd
  *    higher-order functions, and top-k selected per query. No corpus
  *    self-join, so it scales linearly in corpus size × query count.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — the 100 TB path.
  *    The corpus is bucketed once (narrow map + one shuffle on the
  *    bucket key); each query probes only its own bucket. Recall is
  *    tunable via `planes` (fewer planes → bigger buckets → higher
  *    recall, more compute).
  */
object Similarity {

  /** Exact cosine similarity of two array<double> columns — a native
    * codegen'd Catalyst expression (graft.functions.CosineSimilarity).
    * Spark's own zip_with/aggregate route is CodegenFallback and ~10×
    * slower on the million-cosine paths. Returns 0 when either norm
    * is 0. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_sim(a, b)

  /** Deterministic random hyperplanes (fixed seed): `planes` unit-free
    * direction vectors of dimension `dim`. */
  private[graft] def hyperplanes(dim: Int, planes: Int,
      seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern bucket id of a vector under `planes` fixed random
    * hyperplanes — bit j set iff dot(v, h_j) > 0. Cosine-similar
    * vectors agree on most signs, so they land in the same bucket with
    * high probability. Pure expressions; the hyperplanes are literals
    * compiled into the plan (no join against a hyperplane table). */
  def hyperplaneBucket(v: Column, planes: Int = 12, dim: Int = 64,
      seed: Long = 42L): Column = {
    val hs = hyperplanes(dim, planes, seed)
    val bits = hs.zipWithIndex.map { case (h, j) =>
      val dot = graft.functions.VectorFunctions.dot_product(v, typedLit(h))
      when(dot > 0.0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Multi-table LSH signatures: `tables` independent sign-pattern
    * buckets of `planesPerTable` hyperplanes each. A pair is a
    * candidate if it collides in ANY table — any-of-L amplification
    * turns per-plane agreement p into 1-(1-p^m)^L recall, which is what
    * makes hyperplane LSH usable below cosine ≈ 0.9. Returns
    * array<struct<tbl, bucket>> to explode. */
  def hyperplaneBucketTables(v: Column, tables: Int = 8,
      planesPerTable: Int = 4, dim: Int = 64, seed: Long = 42L): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        hyperplaneBucket(v, planesPerTable, dim, seed + 1000L * t)
          .as("bucket"))): _*)

  /** Exact top-k by cosine for each query vector. `queries` must be
    * small (it is broadcast); ties broken by id for determinism. */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).cast("array<double>").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("id"), cosine(col("v"), col("qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: rank only within the query's candidate set —
    * the union of its buckets across L hash tables. Same output shape
    * as [[bruteForceTopK]]; recall < 1 by design, tunable via
    * (tables, planesPerTable). At 100 TB the corpus bucketing is
    * computed once (narrow map), the only shuffle is the hash join on
    * (tbl, bucket), and the query side is broadcast. */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int = 10, tables: Int = 8, planesPerTable: Int = 4,
      dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .select(col("id"), col("v"), explode(
        hyperplaneBucketTables(col("v"), tables, planesPerTable, dim)).as("bk"))
      .select(col("id"), col("v"), col("bk.tbl").as("tbl"),
        col("bk.bucket").as("bucket"))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"), explode(
        hyperplaneBucketTables(col("qv"), tables, planesPerTable, dim)).as("bk"))
      .select(col("query_id"), col("qv"), col("bk.tbl").as("tbl"),
        col("bk.bucket").as("bucket"))
    // cosine per collision inside the broadcast join (narrow, ≤ L
    // recomputes of a cheap dot product), then dedupe on scalar rows —
    // vectors never enter the dedup shuffle
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .select(col("query_id"), col("id"), cosine(col("v"), col("qv")).as("cosine"))
      .groupBy(col("query_id"), col("id"))
      .agg(max(col("cosine")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }
}
