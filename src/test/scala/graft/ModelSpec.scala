package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{BiViews, StarSchema}
import graft.transform.Transforms

class ModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val sessions =
    Transforms.explodeSessions(Fixtures.sessionsDf(spark, month = 2, n = 4))
  private lazy val songs =
    Transforms.enforceSongsSchema(Fixtures.songsDf(spark))
  private lazy val users =
    Transforms.flattenUserLocation(Fixtures.usersDf(spark, month = 2, n = 4))

  test("dimArtists distinct-builds the artist dim") {
    val dim = StarSchema.dimArtists(songs)
    assert(dim.columns.toSeq == Seq("artist_id", "artist_mbid", "artist_name"))
    assert(dim.count() == dim.select("artist_id").distinct().count())
  }

  test("factSession keeps the exploded-item grain") {
    val fact = StarSchema.factSession(sessions)
    assert(fact.count() == sessions.count())
    assert(fact.columns.toSeq == Seq("session_id", "user_id", "song_id",
      "artist_id", "price", "liked", "liked_since", "session_start_time"))
  }

  test("salesPerArtist totals match a direct group-by on the fact") {
    val fact = StarSchema.factSession(sessions)
    // artist dim from the session items themselves (unique per artist_id)
    val dimArtists = sessions.select(col("artist_id"), col("artist_name"))
      .distinct()
    val view = BiViews.salesPerArtist(fact, dimArtists)
    assert(view.columns.toSeq ==
      Seq("session_year", "artist_name", "total_sales"))
    val total = view.agg(sum("total_sales")).collect().head.getDouble(0)
    val expected = fact.agg(sum("price")).collect().head.getDouble(0)
    assert(math.abs(total - expected) < 1e-9)
  }

  test("salesPerCountry groups by month, year, country") {
    val fact = StarSchema.factSession(sessions)
    val dimUsers = StarSchema.dimUsers(users)
    val view = BiViews.salesPerCountry(fact, dimUsers)
    assert(view.columns.toSeq == Seq("session_month", "session_year",
      "country_code", "total_sales"))
    assert(view.count() > 0)
    assert(view.select("session_month").distinct().collect()
      .forall(_.getInt(0) == 2))
  }

  test("BI-view joins broadcast the dim side") {
    val fact = StarSchema.factSession(sessions)
    val dimArtists = sessions.select(col("artist_id"), col("artist_name"))
      .distinct()
    val physical = BiViews.salesPerArtist(fact, dimArtists)
      .queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$physical")
  }
}
