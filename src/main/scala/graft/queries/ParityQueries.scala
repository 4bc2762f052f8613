package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.dq._
import graft.pipeline.RunWindow
import graft.util.Tables

/** One driver-checkable query per SURVEY.md §2 operator, over the
  * /root/testdata tables (domain mapping in FIXTURES.md §C). Each entry
  * pairs the Spark plan with portable ANSI SQL the driver runs in
  * DuckDB; column NAMES AND TYPES are aligned on both sides (sums are
  * computed over DECIMAL(18,2) then cast to double so Spark and DuckDB
  * produce bit-identical results regardless of accumulation order —
  * double summation order is nondeterministic under parallelism, which
  * matters at any scale).
  */
final case class QueryDef(name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object ParityQueries {

  private def money(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val all: Seq[QueryDef] = Seq(

    // P1 — projection + rename (dim_songs-style reshape of `part`)
    QueryDef("q_project_rename",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey").as("song_key"), col("p_name").as("title"),
        col("p_brand").as("artist_name"), col("p_type").as("release_kind"),
        col("p_retailprice").as("price")),
      Some("""SELECT p_partkey AS song_key, p_name AS title,
             |p_brand AS artist_name, p_type AS release_kind,
             |p_retailprice AS price FROM part""".stripMargin)),

    // A3 — DISTINCT dim build (dim_artists-style)
    QueryDef("q_distinct_dim",
      (s, d) => Tables.part(s, d)
        .select(col("p_brand").as("artist_id"), col("p_type").as("artist_name"))
        .distinct(),
      Some("""SELECT DISTINCT p_brand AS artist_id, p_type AS artist_name
             |FROM part""".stripMargin)),

    // P6 — cast / schema enforcement. Spark's double→int cast truncates
    // toward zero; the oracle spells that out with trunc().
    QueryDef("q_cast_enforce",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").cast("string").as("linenumber_str"),
        col("l_quantity").cast("int").as("quantity_int"),
        col("l_extendedprice").cast("float").as("price_float")),
      Some("""SELECT l_orderkey,
             |CAST(l_linenumber AS VARCHAR) AS linenumber_str,
             |CAST(trunc(l_quantity) AS INTEGER) AS quantity_int,
             |CAST(l_extendedprice AS REAL) AS price_float
             |FROM lineitem""".stripMargin)),

    // P2,P3 — literal metadata columns + string→date
    QueryDef("q_lit_metadata",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        lit("postgres_rds").as("source_from"),
        to_date(lit("2020-02-01"), "yyyy-MM-dd").as("ingest_on")),
      Some("""SELECT o_orderkey, 'postgres_rds' AS source_from,
             |DATE '2020-02-01' AS ingest_on FROM orders""".stripMargin)),

    // P4,P5 — positional array extraction, drop the array
    // (user_location[0..4] analog; DuckDB lists are 1-based)
    QueryDef("q_array_extract",
      (s, d) => Tables.embeddings(s, d).select(
        col("vec_id"),
        col("embedding").getItem(0).as("emb_0"),
        col("embedding").getItem(1).as("emb_1"),
        col("embedding").getItem(2).as("emb_2"),
        col("label")),
      Some("""SELECT vec_id, embedding[1] AS emb_0, embedding[2] AS emb_1,
             |embedding[3] AS emb_2, label FROM embeddings""".stripMargin)),

    // G1,G2 — explode/unnest (session_items analog)
    QueryDef("q_explode_unnest",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"), explode(split(col("p_type"), " ")).as("token")),
      Some("""SELECT p_partkey, unnest(string_split(p_type, ' ')) AS token
             |FROM part""".stripMargin)),

    // P7 — ISO-8601 string → timestamp (the reference's UDF, done with
    // the codegen'd built-in; the genuine UDF lives in Transforms and
    // its spec)
    QueryDef("q_iso_timestamp",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        to_timestamp(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .as("session_start_time")),
      Some("""SELECT event_id,
             |strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S')
             |  AS session_start_time
             |FROM events""".stripMargin)),

    // P8 — date_part year/month
    QueryDef("q_date_part",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("session_year"),
        month(col("o_orderdate")).as("session_month")),
      Some("""SELECT o_orderkey,
             |CAST(year(o_orderdate) AS INTEGER) AS session_year,
             |CAST(month(o_orderdate) AS INTEGER) AS session_month
             |FROM orders""".stripMargin)),

    // J1,A1 — sales_per_artist_vw analog: fact ⟕ dim, 2-key group, SUM.
    // Dim side broadcast: `part` is ~0.1% of lineitem — at 100 TB the
    // fact never shuffles for this join.
    QueryDef("q_left_join_sales_artist",
      (s, d) => {
        val li = Tables.lineitem(s, d); val p = Tables.part(s, d)
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
          .groupBy(year(col("l_shipdate")).as("session_year"),
            col("p_brand").as("artist_name"))
          .agg(money(col("l_extendedprice")).as("total_sales"))
      },
      Some("""SELECT CAST(year(l_shipdate) AS INTEGER) AS session_year,
             |p_brand AS artist_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total_sales
             |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
             |GROUP BY 1, 2""".stripMargin)),

    // J2,A2 — sales_per_country_vw analog: 2 left joins, 3-key group
    QueryDef("q_left_join_sales_country",
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .groupBy(month(col("o_orderdate")).as("session_month"),
            year(col("o_orderdate")).as("session_year"),
            col("n_name").as("country_code"))
          .agg(money(col("o_totalprice")).as("total_sales"))
      },
      Some("""SELECT CAST(month(o_orderdate) AS INTEGER) AS session_month,
             |CAST(year(o_orderdate) AS INTEGER) AS session_year,
             |n_name AS country_code,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total_sales
             |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
             |LEFT JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1, 2, 3""".stripMargin)),

    // A4 — DQ IsComplete (single-pass ruleset compile)
    QueryDef("q_dq_is_complete",
      (s, d) => Dqdl.evaluateDf(Tables.customer(s, d), Ruleset("cust", Seq(
        IsComplete("c_custkey"), IsComplete("c_name"),
        IsComplete("c_mktsegment")))),
      Some("""SELECT
             |CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS null_c_custkey,
             |CAST(COUNT(*) - COUNT(c_name) AS BIGINT) AS null_c_name,
             |CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT) AS null_c_mktsegment,
             |CAST(COUNT(*) AS BIGINT) AS row_count,
             |(COUNT(*) - COUNT(c_custkey)) = 0 AS is_complete_c_custkey_passed,
             |(COUNT(*) - COUNT(c_name)) = 0 AS is_complete_c_name_passed,
             |(COUNT(*) - COUNT(c_mktsegment)) = 0 AS is_complete_c_mktsegment_passed,
             |((COUNT(*) - COUNT(c_custkey)) = 0 AND (COUNT(*) - COUNT(c_name)) = 0
             |  AND (COUNT(*) - COUNT(c_mktsegment)) = 0) AS all_passed
             |FROM customer""".stripMargin)),

    // A5 — DQ Uniqueness > 0.95 (Glue semantics: fraction of rows whose
    // value occurs exactly once)
    QueryDef("q_dq_uniqueness",
      (s, d) => Dqdl.evaluateDf(Tables.customer(s, d), Ruleset("cust_uniq",
        Seq(Uniqueness("c_custkey", 0.95)))),
      Some("""WITH g AS (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey)
             |SELECT
             |CAST(SUM(cnt) AS BIGINT) AS row_count,
             |CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |  / CAST(SUM(cnt) AS DOUBLE) AS uniq_ratio_c_custkey,
             |(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |  / CAST(SUM(cnt) AS DOUBLE)) > 0.95 AS uniqueness_c_custkey_passed,
             |(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |  / CAST(SUM(cnt) AS DOUBLE)) > 0.95 AS all_passed
             |FROM g""".stripMargin)),

    // K-anonymity privacy gate over quasi-identifiers, parsed from
    // DQDL text: tiered thresholds (k=5 holds on this corpus, k=10
    // does not) in ONE ruleset — the failing tier also reports the
    // suppression set size (rows in groups under k). The Spark side
    // goes through DqdlParser to pin the string grammar end-to-end.
    QueryDef("q_dq_k_anonymity",
      (s, d) => Dqdl.evaluateDf(Tables.customer(s, d), DqdlParser.parse(
        "cust_kanon",
        """Rules = [ KAnonymity "c_nationkey,c_mktsegment" >= 5,
          |          KAnonymity "c_nationkey,c_mktsegment" >= 10 ]"""
          .stripMargin)),
      Some("""WITH g AS (SELECT COUNT(*) AS cnt FROM customer
             |  GROUP BY c_nationkey, c_mktsegment)
             |SELECT CAST(SUM(cnt) AS BIGINT) AS row_count,
             |CAST(COALESCE(MIN(cnt), 5) AS BIGINT)
             |  AS min_group_5_11c_nationkey_12c_mktsegment,
             |CAST(COALESCE(SUM(CASE WHEN cnt < 5 THEN cnt ELSE 0 END), 0)
             |  AS BIGINT) AS exposed_rows_5_11c_nationkey_12c_mktsegment,
             |CAST(COALESCE(MIN(cnt), 10) AS BIGINT)
             |  AS min_group_10_11c_nationkey_12c_mktsegment,
             |CAST(COALESCE(SUM(CASE WHEN cnt < 10 THEN cnt ELSE 0 END), 0)
             |  AS BIGINT) AS exposed_rows_10_11c_nationkey_12c_mktsegment,
             |COALESCE(MIN(cnt), 5) >= 5
             |  AS k_anonymity_5_11c_nationkey_12c_mktsegment_passed,
             |COALESCE(MIN(cnt), 10) >= 10
             |  AS k_anonymity_10_11c_nationkey_12c_mktsegment_passed,
             |(COALESCE(MIN(cnt), 5) >= 5 AND COALESCE(MIN(cnt), 10) >= 10)
             |  AS all_passed
             |FROM g""".stripMargin)),

    // A6 — DQ ColumnLength = 18 (c_name is fixed 18 chars, like song_id)
    QueryDef("q_dq_column_length",
      (s, d) => Dqdl.evaluateDf(Tables.customer(s, d), Ruleset("cust_len",
        Seq(ColumnLength("c_name", 18)))),
      Some("""SELECT
             |CAST(MIN(LENGTH(c_name)) AS INTEGER) AS min_len_c_name,
             |CAST(MAX(LENGTH(c_name)) AS INTEGER) AS max_len_c_name,
             |CAST(COUNT(*) AS BIGINT) AS row_count,
             |(MIN(LENGTH(c_name)) = 18 AND MAX(LENGTH(c_name)) = 18)
             |  AS column_length_c_name_passed,
             |(MIN(LENGTH(c_name)) = 18 AND MAX(LENGTH(c_name)) = 18)
             |  AS all_passed
             |FROM customer""".stripMargin)),

    // A7,P9 — DQ ColumnValues bound (price<=2 analog on l_discount)
    QueryDef("q_dq_column_values",
      (s, d) => Dqdl.evaluateDf(Tables.lineitem(s, d), Ruleset("li_vals",
        Seq(ColumnValues("l_discount", _ <= 0.1)))),
      Some("""SELECT
             |CAST(SUM(CASE WHEN NOT (l_discount <= 0.1) THEN 1 ELSE 0 END) AS BIGINT)
             |  AS violations_l_discount,
             |CAST(COUNT(*) AS BIGINT) AS row_count,
             |SUM(CASE WHEN NOT (l_discount <= 0.1) THEN 1 ELSE 0 END) = 0
             |  AS column_values_l_discount_passed,
             |SUM(CASE WHEN NOT (l_discount <= 0.1) THEN 1 ELSE 0 END) = 0
             |  AS all_passed
             |FROM lineitem""".stripMargin)),

    // DQDL volume/statistics rules, built through the string PARSER
    // (RowCount / Completeness / Mean between) — the declarative path
    // from ruleset text to a one-pass verdict
    QueryDef("q_dq_volume_stats",
      (s, d) => Dqdl.evaluateDf(Tables.lineitem(s, d),
        graft.dq.DqdlParser.parse("li_volume",
          """Rules = [ RowCount > 1000, Completeness "l_returnflag" > 0.9,
            | Mean "l_quantity" between 20 and 30 ]""".stripMargin)),
      Some("""SELECT
             |CAST(COUNT(l_returnflag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             |  AS complete_ratio_l_returnflag,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |  / CAST(COUNT(l_quantity) AS DOUBLE) AS mean_l_quantity,
             |CAST(COUNT(*) AS BIGINT) AS row_count,
             |COUNT(*) > 1000 AS row_count_gt_1000_passed,
             |(CAST(COUNT(l_returnflag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) > 0.9
             |  AS completeness_l_returnflag_passed,
             |((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |   / CAST(COUNT(l_quantity) AS DOUBLE)) >= 20
             | AND (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |   / CAST(COUNT(l_quantity) AS DOUBLE)) <= 30)
             |  AS mean_l_quantity_passed,
             |(COUNT(*) > 1000
             | AND (CAST(COUNT(l_returnflag) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) > 0.9
             | AND ((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |   / CAST(COUNT(l_quantity) AS DOUBLE)) >= 20
             |  AND (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |   / CAST(COUNT(l_quantity) AS DOUBLE)) <= 30))
             |  AS all_passed
             |FROM lineitem""".stripMargin)),

    // volume ANOMALY detection (the Glue-DQ capability the rule DSL
    // can't express): each ingest day's row count judged against the
    // distribution of all days' counts — z-scores from exact decimal
    // moment sums with a fixed-order float recipe mirrored in the
    // oracle, quantized through DECIMAL(18,9). Two tiny shuffles at
    // any scale (day counts; 1-row stats broadcast back).
    QueryDef("q_dq_anomaly",
      (s, d) => graft.dq.Anomaly.volumeByPartition(
        Tables.events(s, d).select(to_date(col("ts")).as("ingest_on")),
        "ingest_on", zThreshold = 2.0),
      Some("""WITH e AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE)
             |  AS ingest_on FROM events),
             |c AS (SELECT ingest_on, COUNT(*) AS cnt FROM e GROUP BY 1),
             |st AS (SELECT COUNT(*) AS n,
             |  SUM(CAST(cnt AS DECIMAL(28,0))) AS s,
             |  SUM(CAST(CAST(cnt AS DECIMAL(19,0))
             |    * CAST(cnt AS DECIMAL(19,0)) AS DECIMAL(38,0)))
             |    AS ss FROM c),
             |x AS (SELECT c.ingest_on, c.cnt,
             |  CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE) AS mean,
             |  sqrt(CAST(st.ss AS DOUBLE) / CAST(st.n AS DOUBLE)
             |    - (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE))
             |      * (CAST(st.s AS DOUBLE) / CAST(st.n AS DOUBLE)))
             |    AS std
             |  FROM c, st)
             |SELECT ingest_on, cnt,
             |CASE WHEN std > 0.0 THEN CAST(CAST(
             |  (CAST(cnt AS DOUBLE) - mean) / std
             |  AS DECIMAL(18,9)) AS DOUBLE) END AS z,
             |CASE WHEN std > 0.0 THEN
             |  abs((CAST(cnt AS DOUBLE) - mean) / std) >= 2.0
             |ELSE FALSE END AS is_anomaly
             |FROM x""".stripMargin)),

    // widened Glue-DQDL surface through the string parser: schema
    // guard (ColumnExists), decimal-summed statistics (StandardDeviation
    // / Sum), exact domain cardinality (DistinctValuesCount), and the
    // between form of ColumnValues — still ONE aggregation pass
    QueryDef("q_dq_glue_rules",
      (s, d) => Dqdl.evaluateDf(Tables.lineitem(s, d),
        graft.dq.DqdlParser.parse("li_glue",
          """Rules = [ ColumnExists "l_tax",
            | StandardDeviation "l_quantity" between 10 and 20,
            | Sum "l_quantity" > 1000,
            | DistinctValuesCount "l_returnflag" = 3,
            | ColumnValues "l_quantity" between 1 and 50 ]""".stripMargin)),
      Some("""WITH m AS (SELECT
             |  sqrt(CAST(
             |    CAST(COUNT(l_quantity) AS DECIMAL(13,0))
             |      * CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
             |                 * CAST(l_quantity AS DECIMAL(19,4)))
             |             AS DECIMAL(24,6))
             |    - CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DECIMAL(19,4))
             |      * CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DECIMAL(19,4))
             |    AS DOUBLE)
             |    / (CAST(COUNT(l_quantity) AS DOUBLE)
             |       * (CAST(COUNT(l_quantity) AS DOUBLE) - 1.0)))
             |    AS stddev_l_quantity,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
             |    AS sum_l_quantity_gt_1000,
             |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT)
             |    AS distinct_l_returnflag_eq_3,
             |  CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS violations_l_quantity,
             |  CAST(COUNT(*) AS BIGINT) AS row_count,
             |  TRUE AS exists_l_tax
             |  FROM lineitem)
             |SELECT m.*,
             |  exists_l_tax AS column_exists_l_tax_passed,
             |  (stddev_l_quantity >= 10 AND stddev_l_quantity <= 20)
             |    AS stddev_l_quantity_passed,
             |  sum_l_quantity_gt_1000 > 1000 AS sum_l_quantity_gt_1000_passed,
             |  distinct_l_returnflag_eq_3 = 3 AS distinct_l_returnflag_eq_3_passed,
             |  violations_l_quantity = 0 AS column_values_l_quantity_passed,
             |  (exists_l_tax
             |   AND (stddev_l_quantity >= 10 AND stddev_l_quantity <= 20)
             |   AND sum_l_quantity_gt_1000 > 1000
             |   AND distinct_l_returnflag_eq_3 = 3
             |   AND violations_l_quantity = 0) AS all_passed
             |FROM m""".stripMargin)),

    // per-partition DQ: one verdict row per l_returnflag group — the
    // "which increment is bad" shape, same single scan as the global
    // verdict (+ the grouped Uniqueness side-pass)
    QueryDef("q_dq_by_partition",
      (s, d) => Dqdl.evaluateByPartition(Tables.lineitem(s, d),
        Ruleset("li_part", Seq(
          IsComplete("l_partkey"), Uniqueness("l_orderkey", 0.05),
          ColumnValues("l_discount", _ <= 0.1))), "l_returnflag"),
      Some("""WITH g AS (SELECT l_returnflag, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY l_returnflag, l_orderkey),
             |u AS (SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(SUM(cnt) AS DOUBLE) AS uniq_ratio_l_orderkey
             |  FROM g GROUP BY 1),
             |m AS (SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS null_l_partkey,
             |  CAST(SUM(CASE WHEN NOT (l_discount <= 0.1) THEN 1 ELSE 0 END)
             |    AS BIGINT) AS violations_l_discount,
             |  CAST(COUNT(*) AS BIGINT) AS row_count
             |  FROM lineitem GROUP BY 1)
             |SELECT m.l_returnflag, null_l_partkey, violations_l_discount,
             |row_count, uniq_ratio_l_orderkey,
             |null_l_partkey = 0 AS is_complete_l_partkey_passed,
             |uniq_ratio_l_orderkey > 0.05 AS uniqueness_l_orderkey_passed,
             |violations_l_discount = 0 AS column_values_l_discount_passed,
             |(null_l_partkey = 0 AND uniq_ratio_l_orderkey > 0.05
             | AND violations_l_discount = 0) AS all_passed
             |FROM m JOIN u USING (l_returnflag)""".stripMargin)),

    // A8,A9 — dbt unique + not_null tests on a key
    QueryDef("q_dbt_unique_notnull",
      (s, d) => Dqdl.evaluateDf(Tables.orders(s, d), Ruleset("orders_key",
        Seq(UniqueKey("o_orderkey"), NotNull("o_orderkey")))),
      Some("""SELECT
             |CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT)
             |  AS dup_rows_o_orderkey,
             |CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS null_o_orderkey,
             |CAST(COUNT(*) AS BIGINT) AS row_count,
             |(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)) = 0
             |  AS unique_o_orderkey_passed,
             |(COUNT(*) - COUNT(o_orderkey)) = 0 AS not_null_o_orderkey_passed,
             |((COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)) = 0
             |  AND (COUNT(*) - COUNT(o_orderkey)) = 0) AS all_passed
             |FROM orders""".stripMargin)),

    // cross-table DQDL rules (Glue "additional data sources"):
    // ReferentialIntegrity orders→customer plus a passing and a failing
    // RowCountMatch tier — exercising the secondary-frame slot in the
    // evaluator end-to-end through the parser
    QueryDef("q_dq_referential",
      (s, d) => Dqdl.evaluateDf(Tables.orders(s, d),
        graft.dq.DqdlParser.parse("orders_ri",
          """Rules = [
            | ReferentialIntegrity "o_custkey" "customer.c_custkey" >= 0.99,
            | RowCountMatch "customer" >= 5,
            | RowCountMatch "customer" <= 2 ]""".stripMargin),
        refs = Map("customer" -> Tables.customer(s, d))),
      Some("""WITH ri AS (SELECT
             |  CAST(SUM(CASE WHEN ck.c_custkey IS NOT NULL
             |    THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE) AS ri_frac
             |  FROM orders o
             |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) ck
             |    ON o.o_custkey = ck.c_custkey),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS row_count
             |  FROM orders),
             |r AS (SELECT CAST(COUNT(*) AS BIGINT) AS ref_rows
             |  FROM customer)
             |SELECT m.row_count,
             |  ri.ri_frac AS ri_o_custkey_customer_c_custkey_ge_0p99,
             |  r.ref_rows AS ref_rows_customer_ge_5,
             |  r.ref_rows AS ref_rows_customer_le_2,
             |  ri.ri_frac >= 0.99
             |    AS referential_integrity_o_custkey_customer_c_custkey_ge_0p99_passed,
             |  CAST(m.row_count AS DOUBLE) / CAST(r.ref_rows AS DOUBLE)
             |    >= 5.0 AS row_count_match_customer_ge_5_passed,
             |  CAST(m.row_count AS DOUBLE) / CAST(r.ref_rows AS DOUBLE)
             |    <= 2.0 AS row_count_match_customer_le_2_passed,
             |  (ri.ri_frac >= 0.99
             |   AND CAST(m.row_count AS DOUBLE) / CAST(r.ref_rows AS DOUBLE) >= 5.0
             |   AND CAST(m.row_count AS DOUBLE) / CAST(r.ref_rows AS DOUBLE) <= 2.0)
             |    AS all_passed
             |FROM m, ri, r""".stripMargin)),

    // keyed row-level reconciliation (Glue DatasetMatch): orders vs a
    // "migrated" copy with 10% of prices drifted — tiered thresholds
    // straddle the 0.9 match ratio, so one tier passes and one fails.
    // The 91439c558a357b00 alias suffix is the rule-name matchCols
    // digest: CustomSql.digest64("o_totalprice")
    QueryDef("q_dq_dataset_match",
      (s, d) => {
        val orders = Tables.orders(s, d)
        val migrated = orders.withColumn("o_totalprice",
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")))
        Dqdl.evaluateDf(orders, Ruleset("recon", Seq(
          DatasetMatch("migrated", Seq("o_orderkey"), ">=", 0.95,
            matchCols = Seq("o_totalprice")),
          DatasetMatch("migrated", Seq("o_orderkey"), ">=", 0.85,
            matchCols = Seq("o_totalprice")))),
          refs = Map("migrated" -> migrated))
      },
      Some("""WITH ref AS (SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
             |    ELSE o_totalprice END AS o_totalprice FROM orders),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS matched
             |  FROM orders o WHERE EXISTS (SELECT 1 FROM ref r
             |    WHERE r.o_orderkey = o.o_orderkey
             |    AND r.o_totalprice IS NOT DISTINCT FROM o.o_totalprice)),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS row_count
             |  FROM orders)
             |SELECT n.row_count,
             |  m.matched AS matched_rows_migrated_o_orderkey_ge_0p95_91439c558a357b00,
             |  m.matched AS matched_rows_migrated_o_orderkey_ge_0p85_91439c558a357b00,
             |  CAST(m.matched AS DOUBLE) / CAST(n.row_count AS DOUBLE)
             |    >= 0.95 AS dataset_match_migrated_o_orderkey_ge_0p95_91439c558a357b00_passed,
             |  CAST(m.matched AS DOUBLE) / CAST(n.row_count AS DOUBLE)
             |    >= 0.85 AS dataset_match_migrated_o_orderkey_ge_0p85_91439c558a357b00_passed,
             |  (CAST(m.matched AS DOUBLE) / CAST(n.row_count AS DOUBLE) >= 0.95
             |   AND CAST(m.matched AS DOUBLE) / CAST(n.row_count AS DOUBLE) >= 0.85)
             |    AS all_passed
             |FROM m, n""".stripMargin)),

    // O3 + S4 — incremental month window (partition-pruning predicate
    // shape: at scale this prunes to one ingest partition)
    QueryDef("q_incremental_window",
      (s, d) => {
        val w = RunWindow(LocalDate.parse("1995-06-01"),
          LocalDate.parse("1995-07-01"))
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit(w.start.toString)) &&
            col("o_orderdate") < to_timestamp(lit(w.endExclusive.toString)))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1995-06-01'
             |AND o_orderdate < TIMESTAMP '1995-07-01'""".stripMargin)),

    // P10,K1 — coalesce(1) preserves content (oracle checks the count)
    QueryDef("q_coalesce_roundtrip",
      (s, d) => Tables.lineitem(s, d).coalesce(1)
        .agg(count(lit(1)).as("n")),
      Some("SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem")),

    // S6, literal Spectrum shape — a PERSISTENT external-LOCATION
    // catalog table (CREATE TABLE … USING parquet LOCATION): the
    // catalog records metadata only, the query scans the lake files
    // in place through the registered name, filters still push down
    // to the parquet scan (LakeSpec pins EXTERNAL table type and
    // drop-keeps-data)
    QueryDef("q_external_table",
      (s, d) => {
        graft.lake.Lake.registerExternalTable(s, "ext_nation_q",
          s"$d/nation.parquet")
        s.table("ext_nation_q")
          .filter(col("n_regionkey") < 3)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
             |WHERE n_regionkey < 3""".stripMargin)),

    // Incremental aggregate maintenance end-to-end: two window-split
    // refreshes of the crash-safe staged-swap table must equal one
    // from-scratch aggregation over everything — decimal sums make the
    // equality exact regardless of merge order. This puts the
    // IncrementalAgg durability path itself under the oracle gate.
    QueryDef("q_incremental_agg",
      (s, d) => {
        val tbl = "inc_agg_oracle_q"
        // drop catalog entries AND stale warehouse directories: a
        // previous JVM session's managed-table dir survives while the
        // in-memory catalog does not, and CREATE refuses a non-empty
        // location (LOCATION_ALREADY_EXISTS)
        Seq(tbl, s"${tbl}__staged").foreach { t =>
          s.sql(s"DROP TABLE IF EXISTS $t")
          val loc = new org.apache.hadoop.fs.Path(
            s.sessionState.catalog.defaultTablePath(
              s.sessionState.sqlParser.parseTableIdentifier(t)))
          val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
          if (fs.exists(loc)) fs.delete(loc, true)
        }
        val orders = Tables.orders(s, d)
        graft.model.IncrementalAgg.refreshAdditive(s, tbl,
          orders.filter(year(col("o_orderdate")) <= 1995),
          Seq("o_orderpriority"), Seq("o_totalprice"),
          incrementId = Some("w1"))
        graft.model.IncrementalAgg.refreshAdditive(s, tbl,
          orders.filter(year(col("o_orderdate")) > 1995),
          Seq("o_orderpriority"), Seq("o_totalprice"),
          incrementId = Some("w2"))
        s.table(tbl).select(col("o_orderpriority"),
          col("sum_o_totalprice").cast("double").as("total"),
          col("n"))
      },
      Some("""SELECT o_orderpriority,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total,
             |CAST(COUNT(*) AS BIGINT) AS n
             |FROM orders GROUP BY 1""".stripMargin)),
  )
}
