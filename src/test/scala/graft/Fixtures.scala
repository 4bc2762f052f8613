package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Deterministic in-memory fixtures reproducing the reference's input
  * shapes (FIXTURES.md §A): songs CSV rows (all-string), users JSON
  * (positional user_location array), sessions JSON (array-of-struct
  * session_items). Parameterized by month so pipeline tests can run two
  * incremental windows. */
object Fixtures {

  private def jsonDf(spark: SparkSession, lines: Seq[String]): DataFrame =
    spark.read.json(spark.createDataset(lines)(Encoders.STRING))

  def usersJson(month: Int, n: Int = 5): Seq[String] =
    (1 to n).map { i =>
      val uid = f"00000000-0000-0000-000$month%d-${i}%012d"
      s"""{"user_id":"$uid","user_lastname":"Last$i","user_name":"User$i",
         |"user_since":"2019-0$month-0$i",
         |"user_location":["40.7$i","-74.0$i","City$i","C$i","UTC"]}"""
        .stripMargin.replaceAll("\n", "")
    }

  def sessionsJson(month: Int, n: Int = 5): Seq[String] =
    (1 to n).map { i =>
      val uid = f"00000000-0000-0000-000$month%d-${i}%012d"
      val sid = f"10000000-0000-0000-000$month%d-${i}%012d"
      // song_id/artist_id are exactly 18 chars and reference the songs
      // catalog ids (Fixtures.songsCsvRows), so fact→dim joins match
      val itemStrs = (1 to 2).map { j =>
        val songId = f"SO$j%016d"
        val artistId = f"AR$j%016d"
        s"""{"song_id":"$songId","song_name":"Song$j","artist_id":"$artistId",
           |"artist_name":"Artist${j % 3}","price":1.${j}9,"currency":"USD",
           |"liked":${j % 2 == 0},"liked_since":"2020-0$month-0$j"}"""
          .stripMargin.replaceAll("\n", "")
      }.mkString(",")
      s"""{"user_id":"$uid","session_id":"$sid",
         |"session_start_time":"2020-0$month-0${i}T10:15:3$i",
         |"user_agent":"Mozilla/5.0 (Test)","session_items":[$itemStrs]}"""
        .stripMargin.replaceAll("\n", "")
    }

  def songsCsvRows(n: Int = 5): Seq[String] =
    (1 to n).map { i =>
      val songId = f"SO$i%016d"; val trackId = f"TR$i%016d"
      val artistId = f"AR$i%016d"
      s"$songId,$trackId,Title$i,Release$i,${1990 + i},$artistId," +
        s"mbid$i,Artist${i % 3},${180.5 + i},0.${i}5,0.${i}2,${1000 + i},$i,${i * 2}"
    }

  val songsCsvHeader: String =
    "song_id,track_id,title,release,year,artist_id,artist_mbid," +
      "artist_name,duration,artist_familiarity,artist_hotttnesss," +
      "track_7digitalid,shs_perf,shs_work"

  def usersDf(spark: SparkSession, month: Int, n: Int = 5): DataFrame =
    jsonDf(spark, usersJson(month, n))

  def sessionsDf(spark: SparkSession, month: Int, n: Int = 5): DataFrame =
    jsonDf(spark, sessionsJson(month, n))

  /** All-string songs frame, as a header-driven CSV read would give. */
  def songsDf(spark: SparkSession, n: Int = 5): DataFrame = {
    val header = songsCsvHeader.split(",")
    val rows = songsCsvRows(n).map(_.split(",", -1))
    val rdd = spark.sparkContext.parallelize(rows.map(
      r => org.apache.spark.sql.Row.fromSeq(r.toSeq)))
    val schema = org.apache.spark.sql.types.StructType(header.map(
      org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true)))
    spark.createDataFrame(rdd, schema)
  }
}
