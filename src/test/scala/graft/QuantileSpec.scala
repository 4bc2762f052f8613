package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract for the one-pass quantile sketch used by
  * q_approx_quantiles: with accuracy 10000 the rank error is ≤ n/10000,
  * so on our fixtures the sketch must land within a tight value band of
  * the exact sort-based percentile. */
class QuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("percentile_approx tracks exact percentiles within rank error") {
    val li = graft.util.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val approx = li.agg(percentile_approx(col("l_extendedprice"),
      array(ps.map(lit): _*), lit(10000))).head
      .getSeq[Double](0)
    val exact = li.agg(expr(
      s"percentile(l_extendedprice, array(${ps.mkString(",")}))")).head
      .getSeq[Double](0)
    val n = li.count().toDouble
    // rank error n/10000 → compare against the exact value at the
    // shifted ranks; for a distribution this smooth a 1% value band is
    // far looser than the guarantee and keeps the test robust
    approx.zip(exact).foreach { case (a, e) =>
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.01,
        s"approx $a vs exact $e")
    }
  }

  test("q_approx_quantiles emits all-true rank_ok guarantee columns") {
    // the oracle gates this too (literal TRUEs in DuckDB), but keep a
    // local assertion so a sketch regression fails fast in `sbt test`
    val rows = SparkEntry.queries("q_approx_quantiles")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 12) // 3 return flags × 4 percentiles
    rows.foreach(r =>
      assert(r.getBoolean(r.fieldIndex("rank_ok")), r.toString))
  }
}
