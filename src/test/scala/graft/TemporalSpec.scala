package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks latest right at-or-before, null when none") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (2L, "A", ts("2024-01-01 10:05:00")),
      (3L, "B", ts("2024-01-01 09:00:00")), // before any B quote
      (4L, "B", ts("2024-01-01 11:00:00"))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 09:59:00"), 10.0),
      ("A", ts("2024-01-01 10:05:00"), 11.0), // ts-equal: must match trade 2
      ("B", ts("2024-01-01 10:30:00"), 20.0)
    ).toDF("sym", "qts", "price")
    val out = Temporal.asofJoin(trades, quotes, "sym", "ts", "qts",
      Seq("price")).orderBy("trade_id")
      .select("trade_id", "asof_price").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
    assert(out.toSeq == Seq(
      1L -> Some(10.0), 2L -> Some(11.0), 3L -> None, 4L -> Some(20.0)))
  }

  test("asofJoin ignores null-ts and null-key right rows (SQL semantics)") {
    val trades = Seq((1L, "A", ts("2024-01-01 10:00:00")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (Some("A"), None, 99.0),                              // null ts
      (None, Some(ts("2024-01-01 09:00:00")), 98.0),        // null key
      (Some("A"), Some(ts("2024-01-01 09:30:00")), 10.0)    // the real match
    ).toDF("sym", "qts", "price")
    val out = Temporal.asofJoin(trades, quotes, "sym", "ts", "qts",
      Seq("price")).select("asof_price").head
    assert(out.getDouble(0) == 10.0,
      "null-ts/null-key right rows must never match")
  }

  test("asofJoin matches the naive range-join on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(5).toString, rnd.nextInt(10000).toLong))
      .toDF("id", "k", "t")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(5).toString, rnd.nextInt(10000).toLong, i.toLong))
      .distinct.toDF("k", "t", "payload")
      // unique per (k, t) as the contract requires
      .groupBy("k", "t").agg(max("payload").as("payload"))
    val got = Temporal.asofJoin(left, right, "k", "t", "t", Seq("payload"))
      .select("id", "asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // naive: max-ts right row per left via join + window
    val naive = left.as("l")
      .join(right.as("r"), $"l.k" === $"r.k" && $"r.t" <= $"l.t", "left")
      .groupBy($"l.id")
      .agg(max(struct($"r.t", $"r.payload")).getField("payload").as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == naive)
  }

  test("boundedGapSelfJoin equals brute force, each pair exactly once") {
    val rnd = new scala.util.Random(11)
    val ev = (1 to 300).map(i => (i.toLong, rnd.nextInt(4).toLong,
      Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(100000)))))
      .toDF("id", "user", "ts")
    val gapUs = 3600L * 1000000
    val got = Temporal.boundedGapSelfJoin(ev, "user", "ts", "id", gapUs)
      .select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly once per pair
    assert(got.length == got.distinct.length)
    val brute = ev.select($"user", $"id", unix_micros($"ts").as("t"))
      .as("a").join(
        ev.select($"user", $"id", unix_micros($"ts").as("t")).as("b"),
        $"a.user" === $"b.user" &&
          ($"a.t" < $"b.t" || ($"a.t" === $"b.t" && $"a.id" < $"b.id")) &&
          $"b.t" - $"a.t" <= gapUs)
      .select($"a.id", $"b.id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == brute.toSet)
    assert(got.length == brute.length)
  }

  test("boundedGapSelfJoin equals brute force across random seeds (property)") {
    for (seed <- Seq(1, 23, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val ev = (1 to n).map(i => (i.toLong, rnd.nextInt(3).toLong,
        Timestamp.from(java.time.Instant.ofEpochSecond(rnd.nextInt(50000)))))
        .toDF("id", "user", "ts")
      val gapUs = 1800L * 1000000
      val got = Temporal.boundedGapSelfJoin(ev, "user", "ts", "id", gapUs)
        .select("idA", "idB").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = ev.select($"user", $"id", unix_micros($"ts").as("t"))
        .as("a").join(
          ev.select($"user", $"id", unix_micros($"ts").as("t")).as("b"),
          $"a.user" === $"b.user" &&
            ($"a.t" < $"b.t" || ($"a.t" === $"b.t" && $"a.id" < $"b.id")) &&
            $"b.t" - $"a.t" <= gapUs)
        .select($"a.id", $"b.id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute, s"seed $seed mismatch")
    }
  }

  test("resample materializes gaps, forward-fills, keeps spans per key") {
    val df = Seq(
      (1L, ts("2024-01-01 10:15:00"), 2.0),
      (1L, ts("2024-01-01 10:45:00"), 3.0), // same bucket as above
      (1L, ts("2024-01-01 13:10:00"), 7.0), // 2-hour gap before this
      (2L, ts("2024-01-01 00:30:00"), 1.0)  // single-bucket key
    ).toDF("k", "t", "v")
    val out = Temporal.resample(df, "k", "t", "hour",
        aggs = Seq(sum($"v").as("sv")), fillCols = Seq("sv"))
      .orderBy($"k", $"bucket_ts")
      .select($"k", $"bucket_ts", $"sv", $"sv_filled", $"is_gap")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01 10:00:00.0", Some(5.0), 5.0, false),
      (1L, "2024-01-01 11:00:00.0", None, 5.0, true),
      (1L, "2024-01-01 12:00:00.0", None, 5.0, true),
      (1L, "2024-01-01 13:00:00.0", Some(7.0), 7.0, false),
      (2L, "2024-01-01 00:00:00.0", Some(1.0), 1.0, false)))
  }

  test("resample rejects unknown units and empty aggregate lists") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Temporal.resample(df, "k", "t", "fortnight", Seq(sum($"v")), Nil)
    }
    intercept[IllegalArgumentException] {
      Temporal.resample(df, "k", "t", "hour", Nil, Nil)
    }
  }

  test("temporal operators never plan a cartesian/range cross product") {
    val ev = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("id", "user", "ts")
    val band = Temporal.boundedGapSelfJoin(ev, "user", "ts", "id", 1000L)
      .queryExecution.executedPlan.toString
    assert(!band.contains("CartesianProduct") &&
      !band.contains("BroadcastNestedLoopJoin"), band)
    val asof = Temporal.asofJoin(ev, ev.toDF("id2", "user", "ts2"),
      "user", "ts", "ts2", Seq("id2"))
      .queryExecution.executedPlan.toString
    assert(!asof.contains("Join"), // union+window: no join at all
      asof)
  }
}
