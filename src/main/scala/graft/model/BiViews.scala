package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BI aggregate views — the dbt `bi_views` models.
  *
  * Reference provenance: dbt_modeling/models/bi_views/
  * sales_per_artist_vw.sql:1-8, sales_per_country_vw.sql:1-9.
  *
  * Scale notes: fact→dim joins broadcast the dim side (dims are tiny
  * relative to the fact; `broadcast()` pins the choice so a 100 TB fact
  * never shuffles for a kilobyte-scale dim). The group-by aggregates get
  * map-side partial aggregation from Catalyst; grouping keys
  * (year/month × artist/country) are low-cardinality, so the final
  * exchange moves only the partial aggregates, not the fact rows.
  */
object BiViews {

  /** sales_per_artist_vw: year(session_start_time), artist_name,
    * SUM(price) — fact LEFT JOIN dim_artists ON artist_id. */
  def salesPerArtist(factSession: DataFrame, dimArtists: DataFrame): DataFrame =
    factSession
      .join(broadcast(dimArtists), Seq("artist_id"), "left")
      .groupBy(year(col("session_start_time")).as("session_year"),
        col("artist_name"))
      .agg(sum(col("price")).as("total_sales"))

  /** sales_per_country_vw: month, year, country_code, SUM(price) —
    * fact LEFT JOIN dim_users ON user_id. */
  def salesPerCountry(factSession: DataFrame, dimUsers: DataFrame): DataFrame =
    factSession
      .join(broadcast(dimUsers), Seq("user_id"), "left")
      .groupBy(month(col("session_start_time")).as("session_month"),
        year(col("session_start_time")).as("session_year"),
        col("country_code"))
      .agg(sum(col("price")).as("total_sales"))
}
