package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Tables, Telemetry}

class TelemetrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("narrow query reports zero shuffle, full scan counts") {
    val m = Telemetry.measure(
      Tables.part(spark, sf).select(col("p_partkey"), col("p_name")))
    assert(m.rowsOut > 0)
    assert(m.shuffleBytesWritten == 0L, s"narrow map shuffled: $m")
    assert(m.scanOutputRows == m.rowsOut)
    assert(m.filesRead >= 1)
  }

  test("aggregation reports shuffle volume and per-row cost") {
    val m = Telemetry.measure(
      Tables.lineitem(spark, sf)
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity"))))
    assert(m.rowsOut > 0)
    assert(m.shuffleBytesWritten > 0L, s"groupBy without shuffle? $m")
    assert(m.shuffleRecordsWritten > 0L)
    assert(m.shuffleBytesPerOutputRow > 0.0)
    // partial aggregation: shuffled records must not exceed input rows
    assert(m.shuffleRecordsWritten <= m.scanOutputRows)
  }

  test("AQE exchange reuse is not double-counted (ReusedExchange)") {
    // self-join on an aggregated subquery: AQE plans ONE shuffle and a
    // ReusedExchange for the second occurrence, whose metrics alias the
    // original's SQLMetrics (ADVICE r2: the walk used to count both)
    val agg = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    val selfJoined = agg.as("a").join(agg.as("b"), "l_orderkey")
    val m = Telemetry.measure(selfJoined)
    val plan = selfJoined.queryExecution.executedPlan.toString
    assume(plan.contains("ReusedExchange"),
      "planner did not reuse the exchange; nothing to assert")
    // baseline: the same agg measured once, joined against a distinct
    // (non-reusable) copy would write the shuffle twice; with reuse the
    // measured bytes must be ~one shuffle's worth, i.e. strictly less
    // than 1.5× a single agg's shuffle volume
    val single = Telemetry.measure(agg)
    assert(m.shuffleBytesWritten > 0)
    assert(m.shuffleBytesWritten < single.shuffleBytesWritten * 3 / 2,
      s"reused exchange double-counted: joined=$m single=$single")
  }
}
