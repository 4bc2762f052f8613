package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.transform.Transforms

class TransformsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flattenUserLocation hoists positions 0..4 and drops the array") {
    val users = Fixtures.usersDf(spark, month = 2)
    val flat = Transforms.flattenUserLocation(users)
    assert(!flat.columns.contains("user_location"))
    assert(Seq("latitude", "longitude", "place_name", "country_code",
      "timezone").forall(flat.columns.contains))
    val r = flat.filter(col("user_name") === "User1")
      .select("latitude", "place_name", "timezone").collect().head
    assert(r.getString(0) == "40.71")
    assert(r.getString(1) == "City1")
    assert(r.getString(2) == "UTC")
  }

  test("explodeSessions yields one row per item with hoisted fields") {
    val sessions = Fixtures.sessionsDf(spark, month = 2, n = 4)
    val exploded = Transforms.explodeSessions(sessions)
    assert(exploded.count() == 8) // 4 sessions × 2 items
    assert(exploded.columns.toSeq == Seq("user_id", "session_id", "song_id",
      "song_name", "artist_id", "artist_name", "price", "currency", "liked",
      "liked_since", "user_agent", "session_start_time"))
    val lens = exploded.select(min(length(col("song_id"))),
      max(length(col("song_id")))).collect().head
    assert(lens.getInt(0) == 18 && lens.getInt(1) == 18)
  }

  test("explode preserves total item count (property)") {
    // explode row count == sum(size(items)) across sampled sizes
    for (n <- Seq(1, 3, 7)) {
      val sessions = Fixtures.sessionsDf(spark, month = 3, n = n)
      val expected = sessions.select(sum(size(col("session_items"))))
        .collect().head.getLong(0)
      assert(Transforms.explodeSessions(sessions).count() == expected)
    }
  }

  test("enforceSongsSchema casts the 7 numeric columns") {
    val songs = Fixtures.songsDf(spark)
    val cast = Transforms.enforceSongsSchema(songs)
    val t = cast.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(t("duration") == FloatType)
    assert(t("artist_familiarity") == FloatType)
    assert(t("artist_hotttnesss") == FloatType)
    assert(t("year") == IntegerType)
    assert(t("track_7digitalid") == IntegerType)
    assert(t("shs_perf") == IntegerType)
    assert(t("shs_work") == IntegerType)
    assert(t("song_id") == StringType)
    assert(cast.filter(col("year") === 1991).count() == 1)
  }

  test("isoToTimestamp builtin and UDF agree on ISO-8601 strings") {
    import spark.implicits._
    val df = Seq("2020-02-03T10:15:30", "2021-12-31T23:59:59").toDF("s")
    val both = df.select(
      Transforms.isoToTimestamp(col("s")).as("builtin"),
      Transforms.isoToTimestampUdf(col("s")).as("viaUdf"))
    assert(both.filter(col("builtin") =!= col("viaUdf")).isEmpty)
  }

  test("withIngestMetadata adds deterministic partition + stamp columns") {
    val df = Fixtures.usersDf(spark, month = 2)
    val out = Transforms.withIngestMetadata(df,
      java.time.LocalDate.parse("2020-03-01"), "api", "2020-03-01T00:00:00")
    val r = out.select("ingest_on", "source_from", "processing_timestamp")
      .distinct().collect()
    assert(r.length == 1)
    assert(r.head.getDate(0).toString == "2020-03-01")
    assert(r.head.getString(1) == "api")
  }
}
