package graft.transform

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's transform-layer computations, re-expressed as
  * composable DataFrame transforms (all narrow, codegen-friendly; no
  * shuffles introduced here).
  *
  * Reference provenance:
  *  - schema enforcement casts: terraform/assets/transform_jobs/
  *    de-c4w4a2-transform-songs-job.py:81-91
  *  - user_location positional flatten: de-c4w4a2-transform-json-job.py:83-90
  *  - session_items explode + 13-col reshape: transform-json-job.py:114-129
  *  - ingest metadata columns: transform-json-job.py:79-81,94-108
  *  - ISO-string→timestamp UDF: transform-json-job.py:60-64,110-111
  */
object Transforms {

  /** Cast the all-string CSV songs frame to its enforced schema.
    * (reference: transform-songs-job.py:81-91) */
  def enforceSongsSchema(songs: DataFrame): DataFrame = songs
    .withColumn("duration", col("duration").cast(FloatType))
    .withColumn("artist_familiarity", col("artist_familiarity").cast(FloatType))
    .withColumn("artist_hotttnesss", col("artist_hotttnesss").cast(FloatType))
    .withColumn("year", col("year").cast(IntegerType))
    .withColumn("track_7digitalid", col("track_7digitalid").cast(IntegerType))
    .withColumn("shs_perf", col("shs_perf").cast(IntegerType))
    .withColumn("shs_work", col("shs_work").cast(IntegerType))

  /** Hoist `user_location[0..4]` into five scalar columns and drop the
    * array. (reference: transform-json-job.py:83-90; positional
    * semantics: lat, lon, place_name, country_code, timezone) */
  def flattenUserLocation(users: DataFrame,
      locCol: String = "user_location"): DataFrame = users
    .withColumn("latitude", col(locCol).getItem(0))
    .withColumn("longitude", col(locCol).getItem(1))
    .withColumn("place_name", col(locCol).getItem(2))
    .withColumn("country_code", col(locCol).getItem(3))
    .withColumn("timezone", col(locCol).getItem(4))
    .drop(locCol)

  /** Explode `session_items` (array-of-struct) to one row per purchased
    * item, hoisting the struct fields next to the session-level columns.
    * (reference: transform-json-job.py:114-129) */
  def explodeSessions(sessions: DataFrame): DataFrame = sessions
    .withColumn("session_item", explode(col("session_items")))
    .select(
      col("user_id"),
      col("session_id"),
      col("session_item.song_id").as("song_id"),
      col("session_item.song_name").as("song_name"),
      col("session_item.artist_id").as("artist_id"),
      col("session_item.artist_name").as("artist_name"),
      col("session_item.price").as("price"),
      col("session_item.currency").as("currency"),
      col("session_item.liked").as("liked"),
      col("session_item.liked_since").as("liked_since"),
      col("user_agent"),
      col("session_start_time"))

  /** Add the incremental-load metadata columns: the ingestion-date
    * partition column and a source/processing stamp. The processing
    * timestamp is a PARAMETER, not wall-clock `now()` — the reference
    * stamps wall-clock (transform-json-job.py:101), which is
    * non-deterministic; a parameter keeps re-runs and oracle comparisons
    * byte-identical. */
  def withIngestMetadata(df: DataFrame, ingestDate: LocalDate,
      sourceFrom: String, processingTimestamp: String): DataFrame = df
    .withColumn("ingest_on", to_date(lit(ingestDate.toString), "yyyy-MM-dd"))
    .withColumn("source_from", lit(sourceFrom))
    .withColumn("processing_timestamp", lit(processingTimestamp))

  /** ISO-8601 string → timestamp via the built-in (codegen'd, preferred).
    * (replaces the reference's Python UDF, transform-json-job.py:60-64) */
  def isoToTimestamp(c: Column): Column = to_timestamp(c)

  /** Genuine Scala UDF registration proving the UDF surface — semantics
    * identical to the reference's `datetime.fromisoformat` UDF. Kept out
    * of hot paths (UDFs block whole-stage codegen); use
    * [[isoToTimestamp]] in production plans. */
  val isoToTimestampUdf: UserDefinedFunction =
    udf((s: String) =>
      if (s == null) null
      else java.sql.Timestamp.valueOf(java.time.LocalDateTime.parse(s)))
}
