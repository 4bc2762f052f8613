package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.model.IncrementalAgg

class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two incremental refreshes equal one full aggregation") {
    val tbl = "inc_agg_sales"
    val m1 = Seq(("a", 10.0), ("a", 2.5), ("b", 1.0)).toDF("k", "v")
    val m2 = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    IncrementalAgg.refreshAdditive(spark, tbl, m1, Seq("k"), Seq("v"))
    IncrementalAgg.refreshAdditive(spark, tbl, m2, Seq("k"), Seq("v"))
    val incremental = spark.table(tbl)
      .select($"k", $"sum_v".cast("double"), $"n")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val full = m1.unionByName(m2).groupBy($"k")
      .agg(sum($"v".cast(DecimalType(18, 2))).cast("double"),
        count(lit(1)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(incremental == full)
    assert(incremental == Set(("a", 16.5, 3L), ("b", 1.0, 1L),
      ("c", 7.0, 1L)))
  }

  test("many refreshes stay correct and leave a recoverable staged copy") {
    val tbl = "inc_agg_many"
    (1 to 10).foreach { i =>
      IncrementalAgg.refreshAdditive(spark, tbl,
        Seq(("a", i.toDouble)).toDF("k", "v"), Seq("k"), Seq("v"))
    }
    val row = spark.table(tbl).head
    assert(row.getAs[java.math.BigDecimal]("sum_v").doubleValue == 55.0)
    assert(row.getAs[Long]("n") == 10L)
    // the staged table (the crash-recovery copy) matches the main one
    assert(spark.table(s"${tbl}__staged").collect().toSeq ==
      spark.table(tbl).collect().toSeq)
  }

  test("crash between stage and swap is detected and repaired") {
    val tbl = "inc_agg_crash"
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), Seq("v"))
    // Simulate a crash AFTER the staged write+stamp but BEFORE the
    // swap: stage a divergent merge with a bumped generation, leaving
    // the main table stale (exactly the state refreshAdditive leaves
    // if the process dies mid-swap).
    val staged = s"${tbl}__staged"
    Seq(("a", java.math.BigDecimal.valueOf(99.0), 2L))
      .toDF("k", "sum_v", "n")
      .select($"k", $"sum_v".cast(DecimalType(18, 2)).as("sum_v"), $"n")
      .write.mode("overwrite").format("parquet").saveAsTable(staged)
    spark.sql(
      s"ALTER TABLE $staged SET TBLPROPERTIES ('graft.generation'='2')")
    // ADVICE r2: the next routine refresh used to overwrite the staged
    // copy (the ONLY copy of the lost merge). Now it completes the
    // swap first, so the staged state lands in the main table...
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 0.5)).toDF("k", "v"), Seq("k"), Seq("v"))
    val row = spark.table(tbl).head
    // ...and the new increment applies on top of the RECOVERED 99.0,
    // not the stale 1.0
    assert(row.getAs[java.math.BigDecimal]("sum_v").doubleValue == 99.5)
    assert(row.getAs[Long]("n") == 3L)
    // standalone recovery on a consistent table is a no-op
    IncrementalAgg.recoverIfCrashed(spark, tbl)
    assert(spark.table(tbl).head.getAs[java.math.BigDecimal]("sum_v")
      .doubleValue == 99.5)
  }

  test("retry of an identified increment after crash-mid-swap is exactly once") {
    val tbl = "inc_agg_retry"
    def sumV = spark.table(tbl).head
      .getAs[java.math.BigDecimal]("sum_v").doubleValue
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 10.0)).toDF("k", "v"), Seq("k"), Seq("v"),
      incrementId = Some("2020-02"))
    assert(sumV == 10.0)
    // Simulate a crash AFTER staging increment 2020-03 but BEFORE the
    // swap: stage main+inc (= 15.0) with a bumped generation + the
    // increment id, leaving the main table at 10.0.
    val staged = s"${tbl}__staged"
    Seq(("a", java.math.BigDecimal.valueOf(15.0), 2L))
      .toDF("k", "sum_v", "n")
      .select($"k", $"sum_v".cast(DecimalType(18, 2)).as("sum_v"), $"n")
      .write.mode("overwrite").format("parquet").saveAsTable(staged)
    spark.sql(s"ALTER TABLE $staged SET TBLPROPERTIES " +
      "('graft.generation'='2', 'graft.increment'='2020-03')")
    // the at-least-once RETRY of the same increment: must complete the
    // swap, NOT merge the 5.0 a second time (20.0 would be the
    // double-count bug)
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 5.0)).toDF("k", "v"), Seq("k"), Seq("v"),
      incrementId = Some("2020-03"))
    assert(sumV == 15.0)
    // and a re-call after full success is a pure no-op
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 5.0)).toDF("k", "v"), Seq("k"), Seq("v"),
      incrementId = Some("2020-03"))
    assert(sumV == 15.0)
    // the NEXT window applies normally
    IncrementalAgg.refreshAdditive(spark, tbl,
      Seq(("a", 1.0)).toDF("k", "v"), Seq("k"), Seq("v"),
      incrementId = Some("2020-04"))
    assert(sumV == 16.0)
  }
}
