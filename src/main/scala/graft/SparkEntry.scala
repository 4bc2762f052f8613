package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, BreadthQueries, CurationQueries, ExtensionQueries, ModelingQueries, ParityQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one key per implemented SURVEY.md §2 operator to a
  * DataFrame builder over a testdata dir; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for every SQL-expressible entry (column
  * names and types aligned on both sides).
  */
object SparkEntry {

  private def slate: Seq[graft.queries.QueryDef] =
    ParityQueries.all ++ ExtensionQueries.all ++ AnalyticsQueries.all ++
      BreadthQueries.all ++ TpchQueries.all ++ ModelingQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_left_join_sales_artist")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    slate.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    slate.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
