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
}
