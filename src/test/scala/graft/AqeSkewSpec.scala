package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes (not just asserts) SCALING.md's claim that AQE's skew-join
  * rule splits an oversized sort-merge partition at runtime — the
  * regime where `Joins.saltedJoin` is NOT needed. The thresholds are
  * lowered so a local-scale hot key trips the same machinery a 100 TB
  * straggler would.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits the hot key's sort-merge partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    // get() may THROW for never-set keys or return NULL for keys whose
    // default is null — both mean "restore by unsetting"
    val saved = keys.map(k =>
      k -> scala.util.Try(Option(conf.get(k))).toOption.flatten).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // coalescing would merge the small tail partitions and muddy the
      // skew assertion; disable to isolate the skew-split behavior
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // force the sort-merge join AQE's skew rule targets
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // one hot key owns 200k of 220k rows; the dim side is uniform
      val fact = spark.range(0, 220000).select(
        when($"id" < 200000, lit(7L)).otherwise($"id").as("k"),
        $"id".as("payload"))
      val dim = spark.range(0, 230000).select($"id".as("k"),
        ($"id" * 2).as("v"))
      val joined = fact.join(dim, "k")
      // drive THIS Dataset's own queryExecution (count() would build a
      // separate aggregate plan and leave this one un-finalized)
      val n = joined.collect().length.toLong
      // hot key matches dim row 7 → 200000 rows; tail keys 200000..219999
      // each match exactly one dim row → 20000 rows
      assert(n == 220000L, s"join result wrong: $n")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the skew split is visible on the finalized adaptive plan: the
      // SMJ is marked as a skew join and/or the shuffle read reports
      // skewed splits
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin") ||
        plan.toLowerCase.contains("skewed"),
        s"AQE did not mark the skew split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
