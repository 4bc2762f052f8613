package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract for q_heavy_hitters_approx, the sketch twin of
  * the exact iceberg query: the freqItems candidate set must contain
  * every exact heavy hitter (no false negatives — the sketch may only
  * ADD candidates), and the count-min estimate must never
  * underestimate and overestimate by at most a small multiple of
  * eps·N (eps = 1e-4, fixed seed → the run is deterministic). */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  import graft.functions.HeavyHittersSketch.heavy_hitters_sketch

  /** The raw sketch pipeline q_heavy_hitters_approx wraps: estimated
    * hitters by the estimated-share filter. */
  private def sketchHitters(d: String) =
    graft.util.Tables.lineitem(spark, d)
      .agg(heavy_hitters_sketch(col("l_suppkey"), 100,
        0.0001, 0.99, 42).as("hh"))
      .select(col("hh.total").as("total"),
        explode(col("hh.items")).as("it"))
      .filter(col("it.est") * 100 > col("total"))
      .select(col("it.key").as("l_suppkey"), col("it.est").as("est"))

  test("sketch heavy hitters cover the exact ones within CMS error") {
    val d = "/root/testdata/sf0.01"
    val li = graft.util.Tables.lineitem(spark, d)
    val total = li.count()
    val trueCounts = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = trueCounts.filter { case (_, c) => c * 100 > total }

    val approx = sketchHitters(d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // no false negatives: CMS only overestimates, so every exact
    // heavy hitter clears the estimated-share filter too
    assert(exact.keySet.subsetOf(approx.keySet),
      s"missing hitters: ${exact.keySet -- approx.keySet}")
    // candidate set is bounded by 1/support regardless of cardinality
    assert(approx.size <= 100)
    // estimates: never below truth, above by at most 10× the eps·N
    // band (eps·N ≈ 6 rows at this SF; depth-5 sketch puts the
    // 10×-band failure probability at ~1e-5 per key)
    val band = (10 * 0.0001 * total).toLong + 1
    approx.foreach { case (k, est) =>
      val t = trueCounts.getOrElse(k, 0L)
      assert(est >= t, s"key $k: CMS underestimated ($est < $t)")
      assert(est - t <= band, s"key $k: est $est vs true $t (band $band)")
    }
  }

  test("the fused sketch reads lineitem exactly once") {
    val df = sketchHitters("/root/testdata/sf0.01")
    df.collect()
    // count scans in the (AQE-final) plan text — the fused sketch
    // replaced count()+countMinSketch()+freqItems()'s three scans
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head // AQE prints the pre-AQE tree too
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected ONE lineitem scan, plan has $scans:\n$plan")
  }

  test("q_heavy_hitters_approx emits all-true guarantee columns") {
    // the oracle gates this too (literal TRUEs in DuckDB), but keep a
    // local assertion so a sketch regression fails fast in `sbt test`
    val rows = SparkEntry.queries("q_heavy_hitters_approx")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("in_approx")), r.toString)
      assert(r.getBoolean(r.fieldIndex("est_bounded")), r.toString)
      assert(r.getBoolean(r.fieldIndex("all_members_bounded")), r.toString)
    }
  }

  test("Misra-Gries candidates survive adversarial partition merges") {
    import spark.implicits._
    // one key holds 20% of the rows but is concentrated in a few
    // partitions; distractor keys churn the other counters — the MG
    // merge (count-sum then (k+1)-th-largest subtraction) must keep
    // the true hitter regardless of merge order
    val rows = (0 until 5000).map(i => i.toLong % 997 + 100L) ++
      (0 until 2500).map(_ => 7L)
    val df = rows.toDF("k").repartition(16)
    import graft.functions.HeavyHittersSketch.heavy_hitters_sketch
    val hh = df.agg(heavy_hitters_sketch(col("k"), 100,
      0.0001, 0.99, 42).as("hh"))
      .select(col("hh.total").as("total"),
        explode(col("hh.items")).as("it"))
      .filter(col("it.est") * 4 > col("total"))
      .select(col("it.key")).as[Long].collect().toSet
    assert(hh == Set(7L), s"expected the 33% key alone, got $hh")
  }
}
