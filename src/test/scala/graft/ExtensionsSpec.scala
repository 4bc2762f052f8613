package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions needs its own session (extensions bind at build
  * time), so this suite builds one and stops it. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions registers the SQL functions session-wide") {
    val shared = SparkTestSession.spark
    // extensions only bind when the builder CREATES a session — clear
    // the default so getOrCreate doesn't hand back the shared one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT cosine_sim(array(1.0, 0.0), array(1.0, 0.0)) AS c,
          |dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS d,
          |size(minhash_sig(array(1L, 2L, 3L), 8)) AS m,
          |size(shingle_hashes(array('a','b','c','d'), 3)) AS s
          |""".stripMargin).collect().head
      assert(r.getDouble(0) == 1.0)
      assert(r.getDouble(1) == 11.0)
      assert(r.getInt(2) == 8)
      assert(r.getInt(3) == 2)
      // float arrays work through the cast (the SQL-path crash probe)
      val f = spark.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
        .collect().head.getDouble(0)
      assert(f == 1.0)
      // z_value registered as a raw catalyst tree; must agree with the
      // Column-API Layout.zValue
      val z = spark.sql("SELECT z_value(3, 1) AS z").collect().head
      // x=0b11 → out bits 0 and 2; y=0b01 → out bit 1 → 0b0111 = 7
      // (same as LayoutSpec's Column-API zValue known-values case)
      assert(z.getLong(0) == 7L)
      // non-foldable k → clear analysis error, not an internal
      // unbound-reference failure (ADVICE r1)
      val err = intercept[Exception] {
        spark.sql(
          """SELECT minhash_sig(array(1L), CAST(id AS INT))
            |FROM range(3)""".stripMargin).collect()
      }
      assert(err.getMessage.contains("foldable") ||
        err.getMessage.contains("NON_FOLDABLE"),
        s"expected a foldable-argument error, got: ${err.getMessage}")
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
