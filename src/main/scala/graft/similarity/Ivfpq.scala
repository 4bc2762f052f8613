package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.similarity.Ivf.IvfModel
import graft.similarity.Pq.PqModel

/** IVF-PQ: the composed billion-scale ANN index — [[Ivf]]'s trained
  * coarse quantizer routes vectors to cells, and [[Pq]] encodes each
  * vector's RESIDUAL (vector minus its cell centroid) into m-byte
  * codes. Residual encoding is what makes the composition better than
  * either part: within a cell the residual distribution is tight, so
  * the same 8-byte budget quantizes far finer than PQ over raw
  * vectors — MEASURED on the sf0.01 corpus (PqSpec): recall@10 vs
  * exact L2 is 0.450 at nprobe=4 (scanning ¼ of the cells) against
  * 0.375 for raw-vector PQ scanning EVERYTHING; probing all 16 cells
  * reaches 0.460, so the cosine cell routing loses almost nothing.
  *
  * Search probes the query's `nprobe` nearest cells; WITHIN each
  * probed cell the query builds an ADC lookup table against its OWN
  * residual for that cell (query − cell centroid — the residual is
  * cell-dependent, so there is one LUT per (query, probed cell)) and
  * scores candidates by m table lookups. The corpus side of the join
  * carries (cell, code) only — at deployment scale the raw vectors
  * are never read after indexing.
  *
  * Scale shape: indexing is a narrow map (cell assignment + residual
  * + encode, all codegen arithmetic — no join, no shuffle); search
  * joins on the cell id with the tiny probed-query side broadcast, so
  * each query touches nprobe cells' worth of CODES. Everything is
  * deterministic by the same contracts as [[Ivf]] and [[Pq]]
  * (decimal-exact means, left-associated folds, fixed tie-breaks), so
  * the q_ann_ivfpq oracle replays training, routing, residual
  * encoding, and ADC scoring bit-for-bit.
  */
object Ivfpq {

  private def centroidsLit(model: IvfModel): Column =
    typedLit(model.centroids.map(_.toIndexedSeq).toIndexedSeq)

  /** Elementwise residual v − centroid[cell] (exact double
    * subtraction — no accumulation, engine-independent). VectorSubtract
    * rather than `zip_with`: the HOF is CodegenFallback and would drop
    * the whole indexing projection to interpreted eval. */
  private def residual(v: Column, cell: Column, model: IvfModel): Column =
    graft.functions.VectorFunctions.vec_sub(v,
      element_at(centroidsLit(model), cell + 1))

  /** Train the residual PQ codebooks: assign cells with the trained
    * coarse quantizer, subtract centroids, and run [[Pq.train]] on the
    * residual frame (same seeds-by-id, decimal-exact recipe). */
  def trainResidualPq(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfModel, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): PqModel = {
    val v = col(vecCol).cast("array<double>")
    val res = corpus.select(col(idCol).as("id"),
        Ivf.assignCell(v, ivf).as("cell"), v.as("v"))
      .select(col("id"),
        residual(col("v"), col("cell"), ivf).as("rv"))
    Pq.train(res, "id", "rv", m, ksub, iters)
  }

  /** Index the corpus: (id, cell, code) — one narrow codegen map, the
    * persistable asset that replaces the raw vectors at search time. */
  def index(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfModel, pq: PqModel): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    corpus.select(col(idCol).as("id"),
        Ivf.assignCell(v, ivf).as("cell"), v.as("v"))
      .select(col("id"), col("cell"),
        Pq.encode(residual(col("v"), col("cell"), ivf), pq).as("code"))
  }

  /** ANN top-k over the IVF-PQ index. Output (query_id, id, adc_dist,
    * rank), adc_dist approximating squared L2 of residuals within the
    * probed cell — smaller is nearer. */
  def searchTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      ivf: IvfModel, pq: PqModel, k: Int = 10,
      nprobe: Int = 4): DataFrame = {
    // MATERIALIZED, not recomputed per consumer: left as lineage, the
    // join's isnotnull(cell) null-filter rewrites through the
    // projection into isnotnull(<full 16-centroid assignment>) and
    // pushes into the parquet scan as a row-by-row INTERPRETED data
    // filter — measured 10× the whole search (54 s vs 5 s at a 20k
    // corpus). Materializing (id, cell, code) is also the deployment
    // shape: the index is the stored asset, built once, and raw
    // vectors are never read at search time.
    val idx = index(corpus, idCol, vecCol, ivf, pq).localCheckpoint(true)
    val qv = col(queryVecCol).cast("array<double>")
    // one row per (query, probed cell), carrying the LUT built from
    // the query's residual AGAINST THAT CELL — computed before the
    // broadcast, so the join ships query_id + cell + m·ksub doubles
    val q = queries.select(col(queryIdCol).as("query_id"), qv.as("qv"))
      .select(col("query_id"), col("qv"),
        explode(Ivf.probeCells(col("qv"), ivf, nprobe)).as("cell"))
      .select(col("query_id"), col("cell"),
        Pq.lutColumn(residual(col("qv"), col("cell"), ivf), pq)
          .as("lut"))
    val dist = (0 until pq.m).map(s =>
        element_at(element_at(col("lut"), s + 1),
          element_at(col("code"), s + 1) + 1).cast(DecimalType(18, 9)))
      .reduceLeft(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("id").asc)
    idx.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("id"), dist.as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"), col("adc_dist"), col("rank"))
  }
}
