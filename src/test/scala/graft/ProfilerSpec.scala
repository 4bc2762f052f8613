package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dq.Profiler

class ProfilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("profileNumeric computes per-column metrics in one pass") {
    val df = Seq((1, Some(10.0)), (2, Some(20.0)), (3, None), (3, Some(30.0)))
      .toDF("k", "v")
    val prof = Profiler.profileNumeric(df, Seq("k", "v"))
    val m = prof.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.get(2)).toMap
    assert(m(("k", "row_count")) == 4.0)
    assert(m(("k", "null_count")) == 0.0)
    assert(m(("k", "approx_distinct")) == 3.0) // exact at this size
    assert(m(("v", "null_count")) == 1.0)
    assert(m(("v", "min")) == 10.0)
    assert(m(("v", "max")) == 30.0)
    assert(m(("v", "sum")) == 60.0)
    assert(m(("v", "mean")) == 20.0) // over non-null rows
    // one aggregation pass regardless of column count
    val plan = Profiler.profileNumeric(df, Seq("k", "v"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"))
  }

  test("profileNumeric rejects non-numeric columns by name") {
    val df = Seq((1, "a")).toDF("k", "s")
    val e = intercept[IllegalArgumentException](
      Profiler.profileNumeric(df, Seq("k", "s")))
    assert(e.getMessage.contains("s"))
  }
}
