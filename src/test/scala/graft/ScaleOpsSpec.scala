package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dq._
import graft.lake.Lake
import graft.operators.Skew
import graft.transform.Transforms

/** Scale-path operators: DQDL parsing (reference-verbatim strings),
  * salting, bucketed co-located joins. */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the reference's three ruleset strings, verbatim
  // (terraform/modules/data_quality/glue.tf:3,12,21)
  private val songsDqdl =
    """Rules = [ IsComplete "track_id", ColumnLength "track_id" = 18, IsComplete "song_id", ColumnLength "song_id" = 18, IsComplete "artist_id"]"""
  private val sessionsDqdl =
    """Rules = [IsComplete "user_id", IsComplete "session_id", ColumnLength "user_id" = 36, ColumnLength "session_id" = 36, IsComplete "song_id", ColumnValues "price" <= 2]"""
  private val usersDqdl =
    """Rules = [IsComplete "user_id", Uniqueness "user_id" > 0.95, IsComplete "user_lastname", IsComplete "user_name", IsComplete "user_since"]"""

  test("DQDL parser handles the reference's rulesets verbatim") {
    val songs = DqdlParser.parse("songs_dq_ruleset", songsDqdl)
    assert(songs.rules.length == 5)
    assert(songs.rules.count(_.isInstanceOf[IsComplete]) == 3)
    assert(songs.rules.count(_.isInstanceOf[ColumnLength]) == 2)
    val sessions = DqdlParser.parse("sessions_dq_ruleset", sessionsDqdl)
    assert(sessions.rules.length == 6)
    val users = DqdlParser.parse("users_dq_ruleset", usersDqdl)
    assert(users.rules.collect { case Uniqueness(c, th) => (c, th) } ==
      Seq(("user_id", 0.95)))
  }

  test("parsed rulesets evaluate identically to hand-built ones") {
    val songsDf = Transforms.enforceSongsSchema(Fixtures.songsDf(spark))
    val parsed = Dqdl.evaluate(songsDf,
      DqdlParser.parse("songs", songsDqdl))
    assert(parsed.passed)
    val sessionsDf = Transforms.explodeSessions(
      Fixtures.sessionsDf(spark, month = 2))
    assert(Dqdl.evaluate(sessionsDf,
      DqdlParser.parse("sessions", sessionsDqdl)).passed)
    // a violating frame must fail through the parsed ColumnValues too
    val bad = sessionsDf.withColumn("price", lit(9.99))
    val v = Dqdl.evaluate(bad, DqdlParser.parse("sessions", sessionsDqdl))
    assert(!v.passed)
    assert(v.ruleResults("column_values_price") == false)
  }

  test("DQDL parser rejects malformed input with a named error") {
    val e1 = intercept[IllegalArgumentException](
      DqdlParser.parse("x", """IsComplete "a""""))
    assert(e1.getMessage.contains("Rules"))
    val e2 = intercept[IllegalArgumentException](
      DqdlParser.parse("x", """Rules = [ Frobnicate "a" ]"""))
    assert(e2.getMessage.contains("Frobnicate"))
  }

  test("saltedSum equals direct aggregation (incl. a hot key)") {
    val df = ((1 to 5000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-6, s"key $k") }
  }

  test("saltedJoin equals the plain inner join") {
    val left = ((1 to 2000).map(_ => (1L, "hot")) ++
      (2L to 50L).map(i => (i, s"k$i"))).toDF("id", "tag")
    val right = (1L to 50L).map(i => (i, s"payload$i")).toDF("id", "payload")
    val plain = left.join(right, Seq("id")).count()
    val salted = Skew.saltedJoin(left, right, "id", salts = 8).count()
    assert(salted == plain)
  }

  test("keySkewProfile surfaces the hot key first") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k")
    val top = Skew.keySkewProfile(df, "k", topN = 1).collect().head
    assert(top.getString(0) == "hot")
    assert(top.getDouble(2) == 0.9)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val li = (1L to 2000L).map(i => (i % 200, i.toDouble))
      .toDF("okey", "price")
    val o = (0L until 200L).map(i => (i, s"o$i")).toDF("okey", "status")
    Lake.writeBucketed(li, "bkt_lineitem", "okey", 8, Some("okey"))
    Lake.writeBucketed(o, "bkt_orders", "okey", 8, Some("okey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_lineitem")
        .join(spark.table("bkt_orders"), Seq("okey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
