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

  test("suggestRules proposes the right shapes and every suggestion " +
      "HOLDS on the profiled frame") {
    // k: complete + unique; v: nulls + duplicates; w: all null
    val df = Seq(
      (1L, Some(10.0), Option.empty[Double]),
      (2L, Some(10.0), None),
      (3L, None, None),
      (4L, Some(30.0), None)).toDF("k", "v", "w")
    val sg = Profiler.suggestRules(df, Seq("k", "v", "w"))
    val byCol = sg.groupBy(_.column).view.mapValues(_.map(_.rule).toSet)
    assert(byCol("k") ==
      Set("is_complete", "unique_key", "value_range", "mean_in_range"))
    // v: not complete (completeness with headroom), dupes (no unique)
    assert(byCol("v") ==
      Set("completeness", "value_range", "mean_in_range"))
    // all-null column: nothing defensible
    assert(!byCol.contains("w"))
    val comp = sg.find(s => s.column == "v" && s.rule == "completeness").get
    assert(comp.lo.get == 0.74) // floor(3/4 * 100)/100 - 0.01
    val rng = sg.find(s => s.column == "v" && s.rule == "value_range").get
    assert((rng.lo.get, rng.hi.get) == ((10.0, 30.0)))
    // the Deequ contract: suggested constraints pass on the profiling
    // sample itself
    val verdict = graft.dq.Dqdl.evaluate(df,
      graft.dq.Ruleset("suggested", sg.map(_.dqRule)))
    assert(verdict.passed, verdict.toString)
  }
}
