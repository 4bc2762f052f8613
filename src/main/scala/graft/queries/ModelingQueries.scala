package graft.queries

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.ModelRunner
import graft.util.Tables

/** Driver-checkable query for the declarative SQL-file modeling layer
  * (the dbt analog, [[graft.model.ModelRunner]]). The embedded project
  * mirrors the reference's authoring surface one-to-one — templated
  * model SQL (dim_songs.sql:1-7), per-directory materialization
  * (dbt_project.yml:35-42), declared schema tests
  * (schema.yml:10-12,34-36,44-46), and a BI view that names its
  * upstream by `<target_schema>.<model>` (sales_per_artist_vw.sql:5-7)
  * — re-targeted at the TPC-H testdata domain so DuckDB can oracle the
  * whole chain.
  */
object ModelingQueries {

  private val projectFiles: Seq[(String, String)] = Seq(
    "dbt_project.yml" ->
      """name: 'graft_modeling'
        |version: '1.0.0'
        |
        |vars:
        |  source_schema: graft_transform
        |  target_schema: graft_serving
        |
        |models:
        |  graft_modeling:
        |    serving_layer:
        |      +materialized: table
        |    bi_views:
        |      +materialized: view
        |""".stripMargin,

    // serving layer — dim/fact models over the source schema
    // (dim_songs.sql/dim_users.sql/fact_session.sql shapes)
    "models/serving_layer/dim_parts.sql" ->
      """SELECT
        |p_partkey AS song_id,
        |p_name AS title,
        |p_brand AS brand,
        |p_type AS release_kind
        |FROM {{ var("source_schema") }}.part
        |""".stripMargin,

    "models/serving_layer/dim_customers.sql" ->
      """SELECT
        |c.c_custkey AS user_id,
        |c.c_name AS user_name,
        |n.n_name AS country_code
        |FROM {{ var("source_schema") }}.customer c
        |LEFT JOIN {{ var("source_schema") }}.nation n
        |ON c.c_nationkey = n.n_nationkey
        |""".stripMargin,

    "models/serving_layer/fact_sales.sql" ->
      """SELECT
        |l.l_orderkey AS order_id,
        |l.l_linenumber AS line_id,
        |o.o_custkey AS user_id,
        |l.l_partkey AS song_id,
        |l.l_extendedprice AS price,
        |l.l_shipdate AS session_start_time
        |FROM {{ var("source_schema") }}.lineitem l
        |JOIN {{ var("source_schema") }}.orders o
        |ON l.l_orderkey = o.o_orderkey
        |""".stripMargin,

    "models/serving_layer/schema.yml" ->
      """version: 2
        |
        |models:
        |  - name: fact_sales
        |    description: "Fact sales table"
        |    columns:
        |      - name: order_id
        |        description: "Order key of this line"
        |        data_tests:
        |          - not_null
        |      - name: user_id
        |      - name: song_id
        |  - name: dim_parts
        |    description: "Part dimensional table"
        |    columns:
        |      - name: song_id
        |        description: "The primary key for this table"
        |        data_tests:
        |          - unique
        |          - not_null
        |  - name: dim_customers
        |    description: "Customer dimensional table"
        |    columns:
        |      - name: user_id
        |        description: "The primary key for this table"
        |        data_tests:
        |          - unique
        |          - not_null
        |""".stripMargin,

    // BI views — one uses ref(), the other the reference's
    // target_schema-qualified style; both resolve to dependencies.
    // Dim sides are broadcast-hinted: at 100 TB the fact never
    // shuffles for a dimension join.
    "models/bi_views/sales_per_brand_vw.sql" ->
      """SELECT /*+ BROADCAST(dp) */
        |year(fs.session_start_time) AS session_year,
        |dp.brand AS artist_name,
        |CAST(SUM(CAST(fs.price AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM {{ ref('fact_sales') }} fs
        |LEFT JOIN {{ ref('dim_parts') }} dp
        |ON fs.song_id = dp.song_id
        |GROUP BY 1, 2
        |""".stripMargin,

    "models/bi_views/sales_per_country_vw.sql" ->
      """SELECT /*+ BROADCAST(dc) */
        |month(fs.session_start_time) AS session_month,
        |year(fs.session_start_time) AS session_year,
        |dc.country_code,
        |CAST(SUM(CAST(fs.price AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM {{ var("target_schema") }}.fact_sales fs
        |LEFT JOIN {{ var("target_schema") }}.dim_customers dc
        |ON fs.user_id = dc.user_id
        |GROUP BY 1, 2, 3
        |""".stripMargin,

    "models/bi_views/schema.yml" ->
      """version: 2
        |
        |models:
        |  - name: sales_per_country_vw
        |    description: "Sales per country view"
        |    columns:
        |      - name: session_month
        |      - name: session_year
        |      - name: country_code
        |      - name: total_sales
        |""".stripMargin
  )

  /** Project written once per JVM (a few KB of text; warm bench
    * repeats must not leak temp trees). */
  private lazy val projectRoot: Path = {
    val root = Files.createTempDirectory("graft-models")
    root.toFile.deleteOnExit()
    projectFiles.foreach { case (rel, content) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    root
  }

  private val sourceTables =
    Seq("part", "customer", "nation", "lineitem", "orders")

  /** Register the testdata parquet under the source schema as catalog
    * views (the "silver layer already in the warehouse" the reference's
    * dbt models select from). Views, not copies: the models' scans
    * still hit the parquet files directly with pushdown intact. */
  private def registerSources(spark: SparkSession, dir: String): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_transform")
    sourceTables.foreach { t =>
      spark.sql(s"CREATE OR REPLACE VIEW graft_transform.$t AS " +
        s"SELECT * FROM parquet.`$dir/$t.parquet`")
    }
  }

  val all: Seq[QueryDef] = Seq(
    // the full authored pipeline: parse SQL files + YAML, topo-order,
    // CTAS the serving layer (schema tests as a blocking gate), create
    // the BI views, read the terminal view. The oracle replays the
    // model chain inline over the raw tables.
    QueryDef("q_model_runner",
      (s, d) => {
        registerSources(s, d)
        ModelRunner.run(s, ModelRunner.loadProject(projectRoot))
        s.table("graft_serving.sales_per_country_vw")
      },
      Some("""SELECT CAST(month(l.l_shipdate) AS INTEGER) AS session_month,
             |CAST(year(l.l_shipdate) AS INTEGER) AS session_year,
             |n.n_name AS country_code,
             |CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total_sales
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
             |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY 1, 2, 3""".stripMargin)),

    // the incremental-materialization workflow under the gate: the
    // documents corpus split into two ingest "days"; day 1 seeds the
    // source and the FIRST run full-builds the partitioned stats
    // table; day 2 then lands in the source and the SECOND run's
    // is_incremental() high-water filter aggregates ONLY the new
    // partition, insert_overwrite-ing it in place. The final table
    // must equal the one-shot aggregation over the whole corpus —
    // which is exactly what the oracle computes. Built once per
    // (process, data dir); repeats read the landed table.
    QueryDef("q_model_incremental",
      (s, d) => {
        incBuilt.getOrElseUpdate(d, {
          s.sql("CREATE DATABASE IF NOT EXISTS graft_mi_src")
          s.sql("CREATE DATABASE IF NOT EXISTS graft_mi_out")
          s.sql("DROP TABLE IF EXISTS graft_mi_src.docs")
          s.sql("DROP TABLE IF EXISTS graft_mi_out.doc_stats")
          // the durable warehouse dir outlives the in-memory catalog
          // across JVMs: an orphan location from a previous session
          // would fail CREATE with LOCATION_ALREADY_EXISTS — clear it
          // (same discipline as ModelRunner's clearOrphanLocation)
          Seq(("graft_mi_src", "docs"), ("graft_mi_out", "doc_stats"))
            .foreach { case (db, tbl) =>
              if (!s.catalog.tableExists(s"$db.$tbl")) {
                val meta = s.sessionState.catalog.getDatabaseMetadata(db)
                val loc = new org.apache.hadoop.fs.Path(
                  new org.apache.hadoop.fs.Path(meta.locationUri), tbl)
                val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
                if (fs.exists(loc)) fs.delete(loc, true)
              }
            }
          val docs = Tables.documents(s, d)
            .select(col("doc_id"), col("lang"), col("n_chars"),
              when(col("doc_id") % 3 === 0, lit("2024-01-02"))
                .otherwise(lit("2024-01-01")).as("d"))
          docs.filter(col("d") === "2024-01-01").write.mode("overwrite")
            .saveAsTable("graft_mi_src.docs")
          val project = ModelRunner.loadProject(incProjectRoot)
          ModelRunner.run(s, project)
          docs.filter(col("d") === "2024-01-02").write.mode("append")
            .saveAsTable("graft_mi_src.docs")
          ModelRunner.run(s, project)
          true
        })
        s.table("graft_mi_out.doc_stats")
      },
      Some("""WITH src AS (SELECT lang, n_chars,
             |  CASE WHEN doc_id % 3 = 0 THEN '2024-01-02'
             |  ELSE '2024-01-01' END AS d FROM documents)
             |SELECT d, lang, CAST(COUNT(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE)
             |  AS chars
             |FROM src GROUP BY 1, 2""".stripMargin))
  )

  private val incBuilt =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]

  private val incProjectFiles: Seq[(String, String)] = Seq(
    "dbt_project.yml" ->
      """name: 'graft_inc'
        |vars:
        |  source_schema: graft_mi_src
        |  target_schema: graft_mi_out
        |""".stripMargin,
    "models/core/doc_stats.sql" ->
      """{{ config(materialized='incremental',
        |   incremental_strategy='insert_overwrite', partition_by='d') }}
        |SELECT d, lang, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS chars
        |FROM {{ var("source_schema") }}.docs
        |{% if is_incremental() %}
        |WHERE d > (SELECT max(d) FROM {{ this }})
        |{% endif %}
        |GROUP BY d, lang
        |""".stripMargin)

  /** Incremental project written once per JVM (same leak discipline as
    * [[projectRoot]]). */
  private lazy val incProjectRoot: Path = {
    val root = Files.createTempDirectory("graft-inc-models")
    root.toFile.deleteOnExit()
    incProjectFiles.foreach { case (rel, content) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    root
  }
}
