package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Model-based quality filtering: the step after heuristic signals in
  * a modern training-data pipeline (score every document with a small
  * learned classifier, keep the high-scoring slice). The model here is
  * logistic regression over the engine's own quality features, trained
  * BY the engine as a sequence of aggregation passes — no ML runtime,
  * and the whole procedure is deterministic at any parallelism:
  *
  *  - per-row work (logit, sigmoid, error) is a pure function of the
  *    row and the current weights — partitioning can't touch it;
  *  - gradient components accumulate as DECIMAL(38,18) sums (the
  *    cast quantizes each addend at 1e-18, then integer-exact
  *    summation — associative/commutative, so partition merge order
  *    is irrelevant, same recipe as Ivf.train / Profiler);
  *  - the weight update runs on the driver in a fixed order.
  *
  * Bit-identical weights on 1 partition or 1000 — asserted in
  * LogisticQualitySpec. Scale shape: one aggregation job per
  * iteration over a persisted feature table (k+1 decimal sums for k
  * features); only the (k+1)-vector reaches the driver. At 100 TB
  * train on a sample (pass one in) and score the full corpus with the
  * narrow [[score]] map.
  */
object LogisticQuality {

  final case class Model(featureCols: Seq[String],
      weights: IndexedSeq[Double], bias: Double) {
    require(featureCols.size == weights.size)
  }

  /** Linear logit w·x + b as a column — terms fold left in declared
    * feature order, so the float evaluation order is fixed
    * independent of physical plan details. */
  def logit(model: Model): Column =
    model.featureCols.zip(model.weights).foldLeft(lit(model.bias)) {
      case (acc, (c, w)) => acc + col(c).cast("double") * lit(w)
    }

  /** P(label=1 | x). */
  def probability(model: Model): Column =
    lit(1.0) / (lit(1.0) + exp(-logit(model)))

  /** Batch gradient descent. `labelCol` must be 0/1. Features should
    * be roughly unit-scale (the caller normalizes — see
    * [[standardize]]). */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iters: Int = 30, lr: Double = 1.0, l2: Double = 0.0): Model = {
    require(featureCols.nonEmpty && iters > 0)
    val feats = df.select(
      (featureCols.map(c => col(c).cast("double").as(c)) :+
        col(labelCol).cast("double").as("__y")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dec = DecimalType(38, 18)
      var model = Model(featureCols,
        IndexedSeq.fill(featureCols.size)(0.0), 0.0)
      val n = feats.count().toDouble
      for (_ <- 0 until iters) {
        val err = (probability(model) - col("__y")).as("__e")
        val sums = feats.withColumn("__e", err)
          .agg(sum(col("__e").cast(dec)).cast("double").as("g_bias"),
            featureCols.map(c =>
              sum((col("__e") * col(c)).cast(dec)).cast("double")
                .as(s"g_$c")): _*)
          .head()
        val gBias = sums.getDouble(0) / n
        val gW = featureCols.indices
          .map(i => sums.getDouble(i + 1) / n)
        model = Model(featureCols,
          model.weights.indices.map(i => model.weights(i) -
            lr * (gW(i) + l2 * model.weights(i))),
          model.bias - lr * gBias)
      }
      model
    } finally feats.unpersist(false)
  }

  /** Per-feature standardization constants ((x-mean)/std) computed
    * with decimal-exact sums — deterministic at any parallelism.
    * Returns (mean, std) per feature; apply with [[applyStandardize]].
    * Constant columns get std=1 (they contribute nothing either way). */
  def standardize(df: DataFrame, featureCols: Seq[String])
      : Map[String, (Double, Double)] = {
    val dec = DecimalType(38, 12)
    val n = df.count().toDouble
    val sums = df.agg(
      sum(col(featureCols.head).cast(dec)).cast("double"),
      (featureCols.tail.map(c => sum(col(c).cast(dec)).cast("double")) ++
        featureCols.map(c =>
          sum((col(c) * col(c)).cast(dec)).cast("double"))): _*)
      .head()
    featureCols.zipWithIndex.map { case (c, i) =>
      val m = sums.getDouble(i) / n
      val ex2 = sums.getDouble(featureCols.size + i) / n
      val varNum = math.max(ex2 - m * m, 0.0)
      val sd = math.sqrt(varNum)
      c -> (m, if (sd == 0.0) 1.0 else sd)
    }.toMap
  }

  def applyStandardize(df: DataFrame,
      stats: Map[String, (Double, Double)]): DataFrame =
    stats.foldLeft(df) { case (d, (c, (m, sd))) =>
      d.withColumn(c, (col(c).cast("double") - lit(m)) / lit(sd))
    }

  /** Score a corpus: logit per row (narrow map — the classifier-filter
    * pass a 100 TB pipeline runs after training on a sample). */
  def score(df: DataFrame, model: Model, as: String = "quality_logit")
      : DataFrame =
    df.withColumn(as, logit(model))
}
