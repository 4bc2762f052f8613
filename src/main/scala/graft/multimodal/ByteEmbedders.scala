package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The unknown-bytes embedding lane behind [[Multimodal.extractFeatures]],
  * made a VALUE: bytes no real decode path claims are embedded by
  * whatever [[ByteEmbedder]] the caller passes — the default stays the
  * deterministic hash fold ([[Multimodal.hashEmbedding]]), and a model
  * runtime (ONNX/JNI bindings, a remote scorer) slots in as another
  * implementation of the same one-method trait without touching any
  * caller. [[ByteEmbedders.trainLinear]] demonstrates the seam with
  * REAL LEARNED WEIGHTS trained in-repo: a logistic head
  * ([[graft.ml.LogisticQuality]]'s decimal-exact gradient loop — no ML
  * runtime) over deterministic byte statistics, so the "learned model
  * behind the seam" path is exercised end-to-end, not just documented.
  */
trait ByteEmbedder extends Serializable {
  def embed(bytes: Array[Byte]): Array[Float]
}

/** Default lane: the deterministic 8-float hash fold — filterable,
  * reproducible, engine-independent. */
case object HashByteEmbedder extends ByteEmbedder {
  override def embed(bytes: Array[Byte]): Array[Float] =
    Multimodal.hashEmbedding(bytes)
}

/** A LEARNED linear projection over [[ByteEmbedders.byteStats]]:
  * output = [P(label=1), logit, standardized stats…] — dimension 8,
  * same shape as the hash lane, so downstream feature consumers are
  * agnostic to which embedder ran. Weights/means/stds are plain
  * serializable arrays (broadcast with the closure, like IVF
  * centroids); scoring is a narrow per-row map. */
final case class LinearByteEmbedder(weights: IndexedSeq[Double],
    bias: Double, means: IndexedSeq[Double], stds: IndexedSeq[Double])
    extends ByteEmbedder {
  require(weights.size == ByteEmbedders.statDim &&
    means.size == ByteEmbedders.statDim && stds.size == ByteEmbedders.statDim)
  override def embed(bytes: Array[Byte]): Array[Float] = {
    val f = ByteEmbedders.byteStats(bytes)
    val out = new Array[Float](8)
    var logit = bias
    var i = 0
    while (i < f.length) {
      val z = (f(i) - means(i)) / stds(i)
      logit += weights(i) * z
      out(i + 2) = z.toFloat
      i += 1
    }
    out(0) = (1.0 / (1.0 + math.exp(-logit))).toFloat
    out(1) = logit.toFloat
    out
  }
}

object ByteEmbedders {

  /** Dimension of [[byteStats]]. */
  val statDim = 6

  /** Deterministic byte-level statistics — the features a bytes-only
    * lane can honestly compute (no codec, no model): printable ratio,
    * a byte-histogram entropy estimate (bits/8), mean byte value,
    * zero-byte ratio, high-bit ratio, normalized log length. Pure,
    * allocation-light, identical on driver and executor. */
  private[graft] def byteStats(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](statDim)
    if (bytes == null || bytes.isEmpty) return f
    val hist = new Array[Int](256)
    var printable = 0; var zeros = 0; var high = 0; var sum = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      hist(b) += 1
      if (b >= 32 && b < 127) printable += 1
      if (b == 0) zeros += 1
      if (b >= 128) high += 1
      sum += b
      i += 1
    }
    val n = bytes.length.toDouble
    var ent = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j) / n; ent -= p * math.log(p) }
      j += 1
    }
    f(0) = (printable / n).toFloat
    f(1) = (ent / (8 * math.log(2))).toFloat // bits, normalized to [0,1]
    f(2) = (sum / n / 255.0).toFloat
    f(3) = (zeros / n).toFloat
    f(4) = (high / n).toFloat
    f(5) = (math.log1p(n) / 20.0).toFloat
    f
  }

  private val statCols =
    (0 until statDim).map(i => s"__bs$i")

  /** Train the linear lane on a labeled byte corpus
    * (`bytesCol: binary`, `labelCol: 0/1`): byteStats per row (narrow
    * map), decimal-exact standardization, then
    * [[graft.ml.LogisticQuality.train]]'s batch-gradient loop — the
    * whole procedure is deterministic at any parallelism and only the
    * (k+1)-vector of weights reaches the driver per iteration. At
    * 100 TB: train on a sample, embed the full corpus with the
    * returned (serializable, closure-broadcast) embedder. */
  def trainLinear(spark: SparkSession, labeled: DataFrame,
      bytesCol: String = "bytes", labelCol: String = "label",
      iters: Int = 60, lr: Double = 1.0): LinearByteEmbedder = {
    val statsUdf = udf { b: Array[Byte] => byteStats(b) }
    val featDf = labeled.select(
      (statCols.zipWithIndex.map { case (c, i) =>
        statsUdf(col(bytesCol)).getItem(i).as(c)
      } :+ col(labelCol)): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = graft.ml.LogisticQuality.standardize(featDf, statCols)
      val std = graft.ml.LogisticQuality.applyStandardize(featDf, stats)
      val model = graft.ml.LogisticQuality.train(std, statCols, labelCol,
        iters = iters, lr = lr)
      LinearByteEmbedder(model.weights, model.bias,
        statCols.map(c => stats(c)._1), statCols.map(c => stats(c)._2))
    } finally featDf.unpersist(false)
  }
}
