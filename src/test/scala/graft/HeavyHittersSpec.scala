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

  test("sketch heavy hitters cover the exact ones within CMS error") {
    val d = "/root/testdata/sf0.01"
    val li = graft.util.Tables.lineitem(spark, d)
    val total = li.count()
    val trueCounts = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = trueCounts.filter { case (_, c) => c * 100 > total }

    val approx = SparkEntry.queries("q_heavy_hitters_approx")(spark, d)
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
}
