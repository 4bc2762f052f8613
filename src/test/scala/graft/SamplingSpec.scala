package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("sample membership is stable across runs and repartitioning") {
    val a = Sampling.deterministicSample(ids, "id", 30)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids.repartition(13), "id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // roughly the requested fraction (hash uniformity)
    assert(a.size > 2000 * 0.2 && a.size < 2000 * 0.4, s"${a.size}")
  }

  test("splitByHash partitions every row into exactly one split") {
    val s = Sampling.splitByHash(ids, "id", trainPct = 90)
    assert(s.count() == 2000)
    val byName = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "eval"))
    assert(byName("train") + byName("eval") == 2000)
    assert(byName("train") > 1600) // ~90%
    // pct=0 and pct=100 edge cases
    assert(Sampling.deterministicSample(ids, "id", 0).count() == 0)
    assert(Sampling.deterministicSample(ids, "id", 100).count() == 2000)
  }

  test("split assignment is a narrow map (no shuffle)") {
    val plan = Sampling.splitByHash(ids, "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratifiedSample takes exact per-stratum quotas, deterministically") {
    val df = (1L to 100L).map(i => (i, if (i <= 70) "en" else "de"))
      .toDF("id", "lang")
    val sampled = Sampling.stratifiedSample(df, "lang", "id", 0.2)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 14L, "de" -> 6L)) // ceil(.2*70), ceil(.2*30)
    // membership is a pure function of the data: identical under
    // repartitioning
    val a = sampled.collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(df.repartition(17), "lang", "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // edge fractions
    assert(Sampling.stratifiedSample(df, "lang", "id", 0.0).count() == 0)
    assert(Sampling.stratifiedSample(df, "lang", "id", 1.0).count() == 100)
  }
}
