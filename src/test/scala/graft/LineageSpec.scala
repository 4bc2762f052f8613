package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Lineage, Tables}

/** toDF("id","xs") would rename a LocalRelation's _1/_2 via a Project,
  * so origins would (correctly) report the leaf's tuple field names;
  * a case class gives the leaf meaningful attribute names instead. */
case class LineageRec(id: Long, xs: Seq[String])

class LineageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("projection and derived columns trace to their parquet fields") {
    val df = Tables.lineitem(spark, sf).select(
      col("l_orderkey"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"),
      lit("fixed").as("tag"))
    val o = Lineage.columnOrigins(df)
    assert(o("l_orderkey") == Set("lineitem.l_orderkey"))
    assert(o("revenue") ==
      Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(o("tag") == Set.empty, "a literal has no source columns")
  }

  test("lineage flows through join, aggregate, and window") {
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val agg = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
      .withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("qty").desc)))
    val m = Lineage.columnOrigins(agg)
    assert(m("o_orderpriority") == Set("orders.o_orderpriority"))
    assert(m("qty") == Set("lineitem.l_quantity"))
    // the window ranks by qty, which derives from l_quantity
    assert(m("rk") == Set("lineitem.l_quantity"))
  }

  test("explode output traces to the generator's input column") {
    val df = Seq(LineageRec(1L, Seq("a", "b"))).toDF()
      .select(col("id"), explode(col("xs")).as("x"))
    val m = Lineage.columnOrigins(df)
    assert(m("x") == Set("local.xs"))
    assert(m("id") == Set("local.id"))
  }

  test("union merges the origins of both branches per position") {
    val a = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"))
    val b = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"))
    val m = Lineage.columnOrigins(a.union(b))
    assert(m("k") == Set("lineitem.l_orderkey", "orders.o_orderkey"))
  }

  test("inverse lineage finds every dependent output column") {
    val views = Map(
      "rev" -> Tables.lineitem(spark, sf)
        .select((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue")),
      "qty" -> Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("total_qty")))
    val deps = Lineage.dependents(views, "lineitem.l_discount")
    assert(deps == Seq("rev" -> "revenue"))
    val qdeps = Lineage.dependents(views, "lineitem.l_quantity")
    assert(qdeps == Seq("qty" -> "total_qty"))
  }
}
