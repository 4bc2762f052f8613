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
}
