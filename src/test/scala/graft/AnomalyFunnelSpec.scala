package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dq.Anomaly

/** Volume anomaly z-scores and funnel ordering semantics. */
class AnomalyFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("volumeByPartition flags the outlier day and only it") {
    // 9 days of 100 rows + one day of 1000: z(1000) ≈ 2.846, z(100)
    // ≈ -0.316 — only the spike flags at |z| >= 2
    val rows = (1 to 9).flatMap(d => Seq.fill(100)(f"2024-01-$d%02d")) ++
      Seq.fill(1000)("2024-01-10")
    val df = rows.toDF("day")
    val r = Anomaly.volumeByPartition(df, "day").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getBoolean(3)))).toMap
    assert(r("2024-01-10") == ((1000L, true)))
    (1 to 9).foreach(d =>
      assert(r(f"2024-01-$d%02d") == ((100L, false))))
    // hand-check the z value: mean=190, var=(9*100²+1000²)/10-190²
    val mean = 190.0
    val std = math.sqrt((9 * 100.0 * 100 + 1000.0 * 1000) / 10 -
      mean * mean)
    val zExp = BigDecimal((1000.0 - mean) / std)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = Anomaly.volumeByPartition(df, "day").collect()
      .find(_.getString(0) == "2024-01-10").get.getDouble(2)
    assert(z == zExp)
  }

  test("constant volumes yield NULL z and no anomalies (std = 0)") {
    val df = (1 to 3).flatMap(d => Seq.fill(50)(s"d$d")).toDF("day")
    val r = Anomaly.volumeByPartition(df, "day").collect()
    assert(r.forall(_.isNullAt(2)))
    assert(r.forall(!_.getBoolean(3)))
  }

  test("funnel counts only in-order steps") {
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: full ordered funnel; user 2: purchase BEFORE click
    // (click step absent → purchase can't count); user 3: view only
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:30:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      (3L, ts("2024-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    val r = ev
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
        max(col("t3")).as("t3"))
      .agg(count(col("t1")), count(col("t2")), count(col("t3")))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }
}
