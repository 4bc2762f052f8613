package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.LogisticQuality

class LogisticQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // linearly separable with margin: y = [x1 + 2*x2 > 1.5], features
  // deterministic pseudo-random from the row index
  private lazy val separable = {
    (1 to 2000).map { i =>
      val x1 = (i * 7919 % 1000) / 1000.0
      val x2 = (i * 104729 % 1000) / 1000.0
      val y = if (x1 + 2 * x2 > 1.5) 1.0 else 0.0
      (i.toLong, x1, x2, y)
    }.toDF("id", "x1", "x2", "y")
  }

  test("learns a separable concept to high accuracy") {
    val m = LogisticQuality.train(separable, Seq("x1", "x2"), "y",
      iters = 250, lr = 4.0)
    val scored = LogisticQuality.score(separable, m)
      .withColumn("pred", (col("quality_logit") > 0).cast("double"))
    val acc = scored.filter(col("pred") === col("y")).count() / 2000.0
    assert(acc > 0.95, s"accuracy $acc")
    // the learned direction matches the concept: w2 ≈ 2×w1, both > 0
    assert(m.weights.forall(_ > 0), m.toString)
    assert(m.weights(1) > m.weights(0), m.toString)
  }

  test("training is bit-identical across partitionings") {
    def weightsAt(parts: Int) = {
      val m = LogisticQuality.train(separable.repartition(parts),
        Seq("x1", "x2"), "y", iters = 10, lr = 1.0, l2 = 0.01)
      (m.weights, m.bias)
    }
    assert(weightsAt(1) == weightsAt(13))
  }

  test("standardization stats are decimal-exact and reorder-proof") {
    val a = LogisticQuality.standardize(separable, Seq("x1", "x2"))
    val b = LogisticQuality.standardize(separable.repartition(17),
      Seq("x1", "x2"))
    assert(a == b)
    val std = LogisticQuality.applyStandardize(separable, a)
    val mean = std.agg(avg("x1")).head.getDouble(0)
    assert(math.abs(mean) < 1e-9, mean.toString)
  }

  test("end-to-end: weak-label classifier filter over documents") {
    val docs = graft.util.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text"))
          .cast("double").as("n_tok"),
        graft.text.TextAnalysis.qualityScore(col("text")).as("q"),
        (col("n_chars") > 400).cast("double").as("y"))
    val stats = LogisticQuality.standardize(docs, Seq("n_tok", "q"))
    val feats = LogisticQuality.applyStandardize(docs, stats)
    val m = LogisticQuality.train(feats, Seq("n_tok", "q"), "y",
      iters = 50, lr = 1.0)
    val scored = LogisticQuality.score(feats, m)
      .withColumn("pred", (col("quality_logit") > 0).cast("double"))
    val n = scored.count().toDouble
    val acc = scored.filter(col("pred") === col("y")).count() / n
    // n_chars correlates strongly with token count — the classifier
    // must recover the weak label well above chance
    assert(acc > 0.85, s"accuracy $acc")
  }

  test("scoring is a narrow map — no shuffle, no UDF") {
    val m = LogisticQuality.Model(Seq("x1", "x2"),
      IndexedSeq(0.5, -0.25), 0.1)
    val plan = LogisticQuality.score(separable, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("ScalaUDF"), plan)
  }
}
