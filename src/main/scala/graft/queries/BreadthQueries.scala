package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.lake.Layout
import graft.operators.Temporal
import graft.util.Tables

/** Second breadth ring beyond AnalyticsQueries: temporal joins (as-of,
  * bounded-gap band join), pivot/cube/grouping-sets aggregation, a full
  * window-function battery, exact medians, JSON extraction, string
  * functions, and semi/anti joins. Every query carries a DuckDB oracle;
  * sums ride DECIMAL(18,2) so both engines agree bit-for-bit.
  */
object BreadthQueries {

  private def money(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** q_file_skip's range-clustered lineitem dir, one per (process,
    * data dir) — the same reuse discipline as ExtensionQueries'
    * stream-drain outputs: the write is deterministic, so bench
    * repeats read the existing files instead of rewriting 8 parquet
    * files (and leaking a temp dir) per run. */
  private val fileSkipDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Shared oracle CTE: events with timestamps truncated to µs to match
    * Spark's timestamp precision (the parquet holds ns). */
  private val evCte =
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |event_type, value, props FROM events)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // --------------------------------------------- classic warehouse shapes

    // TPC-H Q1 shape (pricing summary): the canonical scan-heavy
    // aggregate. All money math runs in DECIMAL end-to-end (price ×
    // (1-disc) × (1+tax) as exact decimal products), so every engine
    // and every partition order produces identical bits.
    QueryDef("q_tpch_q1",
      (s, d) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(18, 2))
        val frac = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(4, 2))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * frac(lit(1) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * frac(lit(1) - col("l_discount")) *
              frac(lit(1) + col("l_tax"))).cast("double").as("sum_charge"),
            (sum(dec(col("l_quantity"))).cast("double") /
              count(lit(1)).cast("double")).as("avg_qty"),
            (sum(dec(col("l_discount"))).cast("double") /
              count(lit(1)).cast("double")).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS sum_base_price,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
             |  AS sum_disc_price,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))
             |  * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |  / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
             |CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             |  / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
             |CAST(COUNT(*) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY 1, 2""".stripMargin)),

    // TPC-H Q3 shape (shipping priority): selective dim filter,
    // fact⋈fact join on the order key, decimal-exact revenue, top-10
    // with a full tiebreak so the cut line is deterministic
    QueryDef("q_tpch_q3",
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        val l = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |AND o_orderdate < TIMESTAMP '1995-03-15'
             |AND l_shipdate > TIMESTAMP '1995-03-15'
             |GROUP BY 1, 2
             |ORDER BY revenue DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin)),

    // TPC-H Q6 shape (forecast revenue): selective filters that must
    // all push into the parquet scan, one global decimal sum
    QueryDef("q_tpch_q6",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(4, 2)))
          .cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             |AND l_shipdate < TIMESTAMP '1996-01-01'
             |AND l_discount BETWEEN 0.05 AND 0.07
             |AND l_quantity < 24""".stripMargin)),

    // TPC-H Q5 shape (local-supplier volume): the join-ordering/AQE
    // stress query — six tables, a selective region anchor, and the
    // customer-and-supplier-share-a-nation wrinkle that makes join
    // order matter. Spark-first shape: region and nation are TRUE
    // constants (5/25 rows at any SF) and are broadcast explicitly;
    // everything else is declared flat and left to Catalyst/AQE —
    // at bench SFs every dim side ends up broadcast, at 100 TB the
    // lineitem⋈orders spine shuffles on the order key while the date
    // filter still prunes orders at the scan.
    QueryDef("q_tpch_q5",
      (s, d) => {
        val asia = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val o = Tables.orders(s, d)
          // the testdata's order dates span 1995–2001 (TPC-H's spec
          // year 1994 predates them and returns an empty join)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
        val sup = Tables.supplier(s, d)
          .join(broadcast(asia), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          // the Q5 wrinkle: the supplying nation must BE the customer's
          .join(sup, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name").asc)
      },
      Some("""SELECT n_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |AND o_orderdate >= TIMESTAMP '1995-01-01'
             |AND o_orderdate < TIMESTAMP '1996-01-01'
             |GROUP BY 1
             |ORDER BY revenue DESC, n_name ASC""".stripMargin)),

    // TPC-H Q7 shape (volume shipping): the OTHER join-ordering
    // stress — nation joins twice in different roles (supplier's and
    // customer's), and the pair predicate (France↔Germany, either
    // direction) only resolves after both arms meet. The two nation
    // maps broadcast (constant-size); each arm prunes its fact input
    // to the two nations BEFORE the spine join, so at 100 TB the
    // l⋈o⋈c spine shuffles ~8% of rows, not the full tables.
    QueryDef("q_tpch_q7",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_6", "NATION_7"))
          .select(col("n_nationkey").as("s_nk"),
            col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_6", "NATION_7"))
          .select(col("n_nationkey").as("c_nk"),
            col("n_name").as("cust_nation"))
        val sup = Tables.supplier(s, d)
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust = Tables.customer(s, d)
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .select(col("c_custkey"), col("cust_nation"))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d)
              .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast("double").as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
             |FROM supplier
             |JOIN lineitem ON s_suppkey = l_suppkey
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_7')
             |  OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_6'))
             |AND l_shipdate >= TIMESTAMP '1995-01-01'
             |AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY 1, 2, 3
             |ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q10 shape (returned-item losses): quarter window on
    // orders, a returnflag filter that reaches the lineitem scan, a
    // 4-way group over customer attributes, deterministic top-20.
    // At 100 TB the l⋈o spine shuffles on the order key with both
    // date and flag pushed to the scans; nation broadcasts; the final
    // top-20 is a TakeOrdered, never a global sort
    QueryDef("q_tpch_q10",
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val l = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
        val n = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
             |AND o_orderdate < TIMESTAMP '1995-04-01'
             |AND l_returnflag = 'R'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue DESC, c_custkey ASC
             |LIMIT 20""".stripMargin)),

    // Bloom-pruned fact-to-dimension join: the large side is filtered
    // by a driver-merged Bloom filter over the selective dimension's
    // keys BEFORE its shuffle (operators.Joins) — result is exactly
    // the plain inner join (the join clears false positives), which is
    // what the oracle checks
    // exact join-cardinality pre-flight: |L ⋈ R| predicted from two
    // per-key count aggregates (Σ cL(k)·cR(k)) without running the
    // join — here for the self-join of lineitem on partkey, a shape
    // that multiplies (~30 lines/part → ~900 output rows/part). The
    // oracle replays the exact integer arithmetic; DuckDB could also
    // confirm the prediction by running the join, which is the point:
    // the operator never has to.
    QueryDef("q_join_cardinality",
      (s, d) => graft.operators.Joins.joinCardinality(
        Tables.lineitem(s, d), "l_partkey",
        Tables.lineitem(s, d), "l_partkey"),
      // shape-stable oracle: the key-product aggregate sits in its own
      // CTE with COALESCE and CROSS JOINs the totals — mirroring the
      // operator, which always returns exactly ONE row (join_rows=0
      // when no keys match; a GROUP BY t.n would return ZERO rows on
      // an empty key intersection and mismatch)
      Some("""WITH cl AS (SELECT l_partkey AS k,
             |  CAST(COUNT(*) AS BIGINT) AS c FROM lineitem
             |  WHERE l_partkey IS NOT NULL GROUP BY 1),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
             |j AS (SELECT
             |  CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS join_rows,
             |  CAST(COUNT(*) AS BIGINT) AS matching_keys,
             |  CAST(COALESCE(MAX(a.c * b.c), 0) AS BIGINT)
             |    AS max_key_product
             |  FROM cl a JOIN cl b USING (k))
             |SELECT j.join_rows, t.n AS left_rows, t.n AS right_rows,
             |j.matching_keys, j.max_key_product,
             |CAST(j.join_rows * 1000 // GREATEST(t.n, 1)
             |  AS BIGINT) AS blowup_x1000
             |FROM j CROSS JOIN t""".stripMargin)),

    QueryDef("q_bloom_join",
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), col("o_totalprice"))
        graft.operators.Joins.bloomPrunedJoin(Tables.lineitem(s, d),
            "l_orderkey", urgent, "o_orderkey")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("o_totalprice"))
      },
      Some("""SELECT l_orderkey,
             |CAST(l_linenumber AS INTEGER) AS l_linenumber, o_totalprice
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'""".stripMargin)),

    // range-LOOKUP join (operators.Joins.rangeLookupJoin): documents
    // classified into size-band intervals, including an OVERLAPPING
    // band so multi-match semantics is exercised. The naive BETWEEN
    // join has no equi-key (BroadcastNestedLoopJoin, O(fact·dim));
    // the operator bins both sides to floor(x/100) and equi-joins on
    // the bin with the range as a residual — per-row probe work is
    // one bin's intervals at any scale. Oracle = the naive BETWEEN
    // join, which the binned join must reproduce row-for-row.
    QueryDef("q_range_lookup",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("tiny", 0L, 99L), ("small", 100L, 199L),
          ("medium", 200L, 349L), ("large", 350L, 499L),
          ("huge", 500L, 9999L), ("sample_window", 150L, 400L)
        ).toDF("size_class", "lo", "hi")
        graft.operators.Joins.rangeLookupJoin(
            Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
            "n_chars", bands, "lo", "hi", binWidth = 100L)
          .groupBy(col("size_class"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"))
      },
      Some("""WITH bands(size_class, lo, hi) AS (VALUES
             |  ('tiny', 0, 99), ('small', 100, 199),
             |  ('medium', 200, 349), ('large', 350, 499),
             |  ('huge', 500, 9999), ('sample_window', 150, 400))
             |SELECT size_class, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents JOIN bands
             |ON n_chars >= lo AND n_chars <= hi
             |GROUP BY 1""".stripMargin)),

    // Skew-salted fact⋈dim join (operators.Joins.saltedJoin): keys
    // with ≥602 fact rows (the per-supplier median — both paths stay
    // populated) route through a salted two-sided join (per-
    // row salt on the fact, |hot|×saltBuckets replicated dim rows),
    // everything else joins plainly — the RESULT is exactly the plain
    // inner join, which is what the oracle checks. The downstream
    // per-supplier revenue agg would expose any dropped or duplicated
    // row in the sums.
    QueryDef("q_skew_salted_join",
      (s, d) => graft.operators.Joins.saltedJoin(
          Tables.lineitem(s, d)
            .select(col("l_suppkey"), col("l_extendedprice"),
              col("l_discount")),
          "l_suppkey",
          Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
          "s_suppkey", saltBuckets = 8, hotThreshold = 602L)
        .groupBy(col("s_name"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1) - col("l_discount")).cast(DecimalType(4, 2)))
          .cast("double").as("revenue"))
        .orderBy(col("s_name")),
      Some("""SELECT s_name,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |  * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
             |  AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ------------------------------------------------------ temporal joins

    // as-of join: each purchase matched to the user's latest click
    // at-or-before it (union + running last_value — one shuffle, no
    // range explosion; oracle uses DuckDB's native ASOF JOIN)
    QueryDef("q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
        Temporal.asofJoin(purchases, clicks, "user_id", "ts", "ts",
          Seq("click_id", "ts"))
      },
      Some(s"""$evCte,
              |p AS (SELECT event_id, user_id, ts, value FROM e
              |  WHERE event_type = 'purchase'),
              |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM e
              |  WHERE event_type = 'click' GROUP BY 1, 2)
              |SELECT p.event_id, p.user_id, p.ts, p.value,
              |c.click_id AS asof_click_id, c.ts AS asof_ts
              |FROM p ASOF LEFT JOIN c
              |ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)),

    // bounded-gap band self-join: event pairs of the same user within
    // 2 hours, via time-bin bucketing (equi-join on (user, bin), no
    // range cross product; oracle does the quadratic join the operator
    // exists to avoid)
    QueryDef("q_range_join_pairs",
      (s, d) => Temporal.boundedGapSelfJoin(Tables.events(s, d),
        "user_id", "ts", "event_id", 2L * 3600 * 1000000),
      Some(s"""$evCte,
              |t AS (SELECT event_id, epoch_us(ts) AS t, user_id FROM e)
              |SELECT a.user_id, a.event_id AS idA, b.event_id AS idB,
              |b.t - a.t AS gap_us
              |FROM t a JOIN t b ON a.user_id = b.user_id
              |AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
              |AND b.t - a.t <= 7200000000""".stripMargin)),

    // ------------------------------------------- pivot / cube / group sets

    // pivot: sales by year × order priority as columns (explicit value
    // list — no extra distinct job to discover pivot values)
    QueryDef("q_pivot_priority",
      (s, d) => Tables.orders(s, d)
        .withColumn("prio",
          concat(lit("p"), substring(col("o_orderpriority"), 1, 1)))
        .groupBy(year(col("o_orderdate")).as("session_year"))
        .pivot("prio", Seq("p1", "p2", "p3", "p4", "p5"))
        .agg(money(col("o_totalprice"))),
      Some {
        val cols = (1 to 5).map(i =>
          s"""CAST(SUM(CASE WHEN substring(o_orderpriority, 1, 1) = '$i'
             |  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
             |  AS p$i""".stripMargin).mkString(",\n")
        s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS session_year,
           |$cols
           |FROM orders GROUP BY 1""".stripMargin
      }),

    // exact heavy hitters: keys above their uniform 1/k share of the
    // table (the frequent-items/iceberg query; Misra-Gries' exact
    // form). One map-side-combined count per key, one 1-row total
    // broadcast, a multiplicative threshold (cnt × k > total — no
    // division, no rounding ambiguity at the boundary). At 100 TB the
    // only full-width exchange carries (key, partial-count) pairs.
    QueryDef("q_heavy_hitters",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val counts = li.groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("cnt"))
        val total = li.agg(count(lit(1)).as("total"))
        counts.crossJoin(broadcast(total))
          .filter(col("cnt") * 100 > col("total"))
          .select(col("l_suppkey"), col("cnt"),
            (col("cnt").cast("double") / col("total").cast("double"))
              .as("share"))
          .orderBy(col("l_suppkey"))
      },
      Some("""WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT COUNT(*) AS total FROM lineitem)
             |SELECT l_suppkey, cnt,
             |CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share
             |FROM c, t WHERE cnt * 100 > total
             |ORDER BY 1""".stripMargin)),

    // approximate heavy hitters — the sketch twin of q_heavy_hitters
    // for the 10^11-distinct-key regime, following the established
    // approx/exact-twin convention (q_approx_quantiles /
    // q_exact_quantiles): sketch internals are engine-specific →
    // rows-only; HeavyHittersSpec pins the error against the exact
    // form. ONE fused aggregation pass (functions.HeavyHittersSketch):
    // a Misra-Gries candidate map (≤ 100 counters — a SUPERSET of
    // every key above the 1% support; may admit false positives,
    // never drops a true heavy hitter), a seeded count-min sketch
    // estimating each candidate's count (overestimate-only, error
    // ≤ eps·N w.h.p.), and the row total from the sketch itself —
    // what count() + countMinSketch() + freqItems() used to compute
    // in THREE scans. The key space is never shuffled: O(k + sketch)
    // partials merge executor-side; one digest row reaches the plan.
    // Error is ONE-SIDED by construction: filtering on the CMS
    // overestimate keeps every true hitter (no false negatives), but
    // a key within eps·N BELOW the 1% threshold can pass — at
    // threshold-adjacent counts the result is sketch-parameter-
    // dependent (deterministic here: fixed seed, fixed parallelism).
    // The hashed output carries the sketch's GUARANTEES, not its raw
    // estimates (those are engine-specific): keyed by the EXACT heavy
    // hitters, it asserts (a) no false negatives — every true hitter
    // is in the sketch's candidate set (Misra-Gries with k=100
    // counters provably retains every key with count > N/100);
    // (b) each hitter's estimate is an overestimate within eps·N
    // (count-min's one-sided bound); (c) ALL sketch members — including
    // threshold-adjacent false positives, whose membership is
    // sketch-parameter-dependent and so excluded from the keyed rows —
    // satisfy the same est bound. The DuckDB oracle emits literal TRUE
    // for each check, so a violated guarantee is a hash mismatch.
    QueryDef("q_heavy_hitters_approx",
      (s, d) => {
        import graft.functions.HeavyHittersSketch.heavy_hitters_sketch
        val li = Tables.lineitem(s, d)
        val eps = 0.0001
        val sk = li.agg(heavy_hitters_sketch(col("l_suppkey"), 100,
            eps, 0.99, 42).as("hh"))
          .select(col("hh.total").as("sk_total"),
            explode(col("hh.items")).as("it"))
          .select(col("sk_total"), col("it.key").as("l_suppkey"),
            col("it.est").as("est"))
        val counts = li.groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("cnt"))
        val total = li.agg(count(lit(1)).as("n"))
        // one tiny boolean: every sketch member's est sits in
        // [cnt, cnt + eps·N] (members absent from counts are
        // impossible — MG only ever admits observed keys)
        val memberChecks = sk.join(counts, Seq("l_suppkey"), "left")
          .agg(bool_and(col("est") >= coalesce(col("cnt"), lit(0L)) &&
            col("est") <= coalesce(col("cnt"), lit(0L)) +
              lit(eps) * col("sk_total")).as("all_members_bounded"))
        counts.crossJoin(broadcast(total))
          .filter(col("cnt") * 100 > col("n"))
          .join(broadcast(sk.select(col("l_suppkey"), col("est"))),
            Seq("l_suppkey"), "left")
          .crossJoin(broadcast(memberChecks))
          .select(col("l_suppkey"), col("cnt"),
            col("est").isNotNull.as("in_approx"),
            (col("est").isNotNull && col("est") >= col("cnt") &&
              col("est") <= col("cnt") + lit(eps) * col("n"))
              .as("est_bounded"),
            col("all_members_bounded"))
          .orderBy(col("l_suppkey"))
      },
      Some("""WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT COUNT(*) AS total FROM lineitem)
             |SELECT l_suppkey, cnt, TRUE AS in_approx,
             |TRUE AS est_bounded, TRUE AS all_members_bounded
             |FROM c, t WHERE cnt * 100 > total
             |ORDER BY 1""".stripMargin)),

    // unpivot via the stack UDTF — the inverse of q_pivot_priority:
    // one wide row fans out to one long row per measure, the
    // melt/long-format reshape every feature pipeline needs. stack is
    // a generator (codegen'd), not a join or union of rescans — ONE
    // pass over orders produces both measures
    QueryDef("q_unpivot_stack",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("stack(2, 'totalprice', o_totalprice, " +
            "'custkey_num', CAST(o_custkey AS DOUBLE)) " +
            "AS (measure, val)")),
      Some("""SELECT o_orderkey, 'totalprice' AS measure,
             |o_totalprice AS val FROM orders
             |UNION ALL
             |SELECT o_orderkey, 'custkey_num' AS measure,
             |CAST(o_custkey AS DOUBLE) AS val FROM orders"""
        .stripMargin)),

    // cube: all 4 grouping combinations of (year, status) + grouping_id
    QueryDef("q_cube_sales",
      (s, d) => Tables.orders(s, d)
        .cube(year(col("o_orderdate")).as("session_year"),
          col("o_orderstatus"))
        .agg(money(col("o_totalprice")).as("total_sales"),
          count(lit(1)).as("n"), grouping_id().as("gid")),
      Some("""WITH o AS (SELECT year(o_orderdate) AS sy, o_orderstatus,
             |  o_totalprice FROM orders)
             |SELECT CAST(sy AS INTEGER) AS session_year, o_orderstatus,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total_sales,
             |CAST(COUNT(*) AS BIGINT) AS n,
             |CAST(GROUPING(sy, o_orderstatus) AS BIGINT) AS gid
             |FROM o GROUP BY CUBE(sy, o_orderstatus)""".stripMargin)),

    // explicit grouping sets via SQL (year-only and priority-only)
    QueryDef("q_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql("""SELECT year(o_orderdate) AS session_year, o_orderpriority,
                |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                |  AS total_sales
                |FROM orders_gs
                |GROUP BY GROUPING SETS ((year(o_orderdate)),
                |  (o_orderpriority))""".stripMargin)
      },
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS session_year,
             |o_orderpriority,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS total_sales
             |FROM orders
             |GROUP BY GROUPING SETS ((year(o_orderdate)),
             |  (o_orderpriority))""".stripMargin)),

    // ----------------------------------------------------------- windows

    // the full analytic-window battery over per-customer order history:
    // lag/lead, running decimal total, dense_rank/percent_rank/ntile
    // (rank windows totally ordered via the unique key so tile
    // assignment is deterministic in any engine)
    QueryDef("q_window_analytics",
      (s, d) => {
        val seq = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
        val run = seq.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val rnk = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(seq).as("prev_price"),
          lead(col("o_totalprice"), 1).over(seq).as("next_price"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(run)
            .cast("double").as("run_total"),
          dense_rank().over(rnk).as("price_rank"),
          percent_rank().over(rnk).as("price_pct"),
          ntile(4).over(rnk).as("quartile"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |lag(o_totalprice, 1) OVER seq AS prev_price,
             |lead(o_totalprice, 1) OVER seq AS next_price,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderkey
             |   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total,
             |CAST(dense_rank() OVER rnk AS INTEGER) AS price_rank,
             |percent_rank() OVER rnk AS price_pct,
             |CAST(ntile(4) OVER rnk AS INTEGER) AS quartile
             |FROM orders
             |WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderkey),
             |rnk AS (PARTITION BY o_custkey
             |  ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin)),

    // first/last/nth_value window functions: running-first under the
    // default ANSI frame, partition-final via an explicit full frame,
    // nth under the running frame (null until the frame holds n rows)
    QueryDef("q_first_last_value",
      (s, d) => {
        val seq = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderkey"))
        val full = seq.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(seq).as("first_price"),
          last(col("o_totalprice")).over(full).as("final_price"),
          nth_value(col("o_totalprice"), 2).over(seq).as("second_price"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |first_value(o_totalprice) OVER seq AS first_price,
             |last_value(o_totalprice) OVER
             |  (PARTITION BY o_custkey ORDER BY o_orderkey
             |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |  AS final_price,
             |nth_value(o_totalprice, 2) OVER seq AS second_price
             |FROM orders
             |WINDOW seq AS (PARTITION BY o_custkey ORDER BY o_orderkey)"""
        .stripMargin)),

    // RANGE-frame window: rolling 90-day spend per customer — the
    // time-based sibling of the ROWS frames above; the frame is
    // defined on the ordering VALUE (epoch seconds), so ties share a
    // frame and gaps shrink it
    QueryDef("q_rolling_time_window",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(unix_timestamp(col("o_orderdate")))
          .rangeBetween(-90L * 86400, 0)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("spend_90d"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
             |  AS DOUBLE) AS spend_90d
             |FROM orders""".stripMargin)),

    // exact median per group via middle-row selection (sort-based — the
    // deterministic cross-engine shape; percentile_cont interpolation
    // formulas differ across engines in the last ulp)
    QueryDef("q_median_acctbal",
      (s, d) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        val p = Window.partitionBy(col("c_mktsegment"))
        Tables.customer(s, d)
          .select(col("c_mktsegment"),
            col("c_acctbal").cast(DecimalType(12, 2)).as("bal"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(p).as("cnt"))
          .filter(col("rn") === ((col("cnt") + 1) / 2).cast("long") ||
            col("rn") === ((col("cnt") + 2) / 2).cast("long"))
          .groupBy(col("c_mktsegment"))
          .agg(avg(col("bal")).cast("double").as("median_acctbal"))
      },
      Some("""WITH r AS (SELECT c_mktsegment,
             |  CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
             |  row_number() OVER (PARTITION BY c_mktsegment
             |    ORDER BY c_acctbal ASC, c_custkey ASC) AS rn,
             |  COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
             |  FROM customer)
             |SELECT c_mktsegment,
             |CAST(AVG(bal) AS DOUBLE) AS median_acctbal
             |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
             |GROUP BY 1""".stripMargin)),

    // ------------------------------------------------- scalar breadth

    // JSON extraction from the event props payload (S2/P-family analog
    // for semi-structured columns)
    QueryDef("q_json_extract",
      (s, d) => Tables.events(s, d).select(col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k")),
      Some("""SELECT event_id, event_type,
             |CAST(props->>'$.k' AS INTEGER) AS k
             |FROM events""".stripMargin)),

    // Spark 4 VARIANT twin of q_json_extract: props parsed ONCE into
    // the binary variant encoding, then typed extraction, schema
    // introspection, missing-path try-get, and a derived bucket all
    // read the variant — at scale this is the semi-structured path
    // that replaces per-access JSON string re-parsing (and is what
    // shredded storage optimizes); the oracle reads the same facts
    // straight off the JSON text
    QueryDef("q_variant_extract",
      (s, d) => {
        val v = parse_json(col("props"))
        Tables.events(s, d).select(col("event_id"),
          variant_get(v, "$.k", "int").as("k"),
          schema_of_variant(v).as("vschema"),
          try_variant_get(v, "$.missing", "int").as("missing"),
          expr("CAST(variant_get(parse_json(props), '$.k', 'int') div 10 AS INT)")
            .as("k_bucket"))
      },
      Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k,
             |'OBJECT<k: BIGINT>' AS vschema,
             |CAST(NULL AS INTEGER) AS missing,
             |CAST(CAST(props->>'$.k' AS INTEGER) // 10 AS INTEGER)
             |  AS k_bucket
             |FROM events""".stripMargin)),

    // MapType battery (the one SURVEY §1.2 type the reference never
    // uses): props parsed into a real map<string,int>, then size,
    // lookup, key sort, containment, and a transform_values
    // higher-order function — the oracle reads the same facts straight
    // off the JSON, so the map layer itself is what's under test
    QueryDef("q_map_funcs",
      (s, d) => {
        val m = from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType))
        Tables.events(s, d).select(col("event_id"),
          size(m).as("n_keys"),
          element_at(m, "k").as("k_value"),
          array_join(array_sort(map_keys(m)), ",").as("keys"),
          element_at(transform_values(m,
            (_, v) => v * 2), "k").as("doubled"),
          // value-based (non-null), not key-presence: the oracle's
          // props->>'k' IS NOT NULL is value-based, and from_json
          // keeps a {"k": null} key that map_contains_key would
          // report true for (ADVICE r5)
          element_at(m, "k").isNotNull.as("has_k"))
      },
      Some("""SELECT event_id,
             |CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
             |CAST(props->>'k' AS INTEGER) AS k_value,
             |array_to_string(list_sort(json_keys(props)), ',') AS keys,
             |CAST(props->>'k' AS INTEGER) * 2 AS doubled,
             |props->>'k' IS NOT NULL AS has_k
             |FROM events""".stripMargin)),

    // string-function battery over part names
    QueryDef("q_string_funcs",
      (s, d) => Tables.part(s, d).select(col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name5"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_size")).as("brand_size")),
      Some("""SELECT p_partkey,
             |upper(p_name) AS name_upper,
             |substring(p_name, 1, 5) AS name5,
             |regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |lpad(p_brand, 12, '#') AS brand_pad,
             |replace(p_type, ' ', '_') AS type_snake,
             |CAST(length(p_name) AS INTEGER) AS name_len,
             |concat_ws('|', p_brand, p_size) AS brand_size
             |FROM part""".stripMargin)),

    // approximate quantiles via Spark's built-in sketch (one pass, no
    // sort — the 100 TB way to get percentiles). Sketch VALUES are
    // engine-specific, so the hashed output carries the published
    // GUARANTEE instead of the raw estimate: percentile_approx at
    // accuracy A returns a dataset element whose rank is within
    // N/A of the target rank (SPARK-16283's rank-eps contract). The
    // query recomputes each estimate's true rank range
    // [cnt_lt+1, cnt_le] against the group's target rank p·n and
    // emits `rank_ok` — the DuckDB oracle emits literal TRUE for the
    // same (flag, pct) keys, so any out-of-bound estimate is a hash
    // mismatch, not a rows-only shrug. Accuracy 10000 (10× default)
    // is deliberate: same-session A/B (SCALING.md, round 7) measured
    // it free at this sketch size. Cost shape: one sketch pass + one
    // broadcast-join recount pass (12 estimate rows broadcast) — no
    // sort, no full shuffle of lineitem.
    QueryDef("q_approx_quantiles",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val eps = 1.0 / 10000
        val approx = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
            lit(10000)).as("qs"))
          .select(col("l_returnflag"),
            posexplode(col("qs")).as(Seq("pct_idx", "aq")))
          .withColumn("pct",
            element_at(array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)),
              col("pct_idx") + 1))
        li.join(broadcast(approx), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("pct_idx"), col("pct"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("l_extendedprice") < col("aq"), 1L)
              .otherwise(0L)).as("cnt_lt"),
            sum(when(col("l_extendedprice") <= col("aq"), 1L)
              .otherwise(0L)).as("cnt_le"))
          // the estimate's rank range [cnt_lt+1, cnt_le] must overlap
          // the allowed window [(p-eps)·n, (p+eps)·n] (+1 absorbs the
          // floor/ceil convention at the window edges)
          .select(col("l_returnflag"), col("pct_idx"),
            ((col("cnt_le") + 1 >= (col("pct") - eps) * col("n")) &&
              (col("cnt_lt") <= (col("pct") + eps) * col("n") + 1))
              .as("rank_ok"))
      },
      Some("""SELECT l_returnflag, CAST(i - 1 AS INTEGER) AS pct_idx,
             |TRUE AS rank_ok
             |FROM (SELECT DISTINCT l_returnflag FROM lineitem),
             |     generate_series(1, 4) t(i)""".stripMargin)),

    // the exact twin of q_approx_quantiles, hash-checked: Spark's
    // `percentile` and DuckDB's `quantile_cont` share the linear-
    // interpolation definition; emitting float32 absorbs the last-ulp
    // drift two different interpolation formulas can produce
    QueryDef("q_exact_quantiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(percentile(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95))).as("qs"))
        .select(col("l_returnflag"),
          posexplode(col("qs")).as(Seq("pct_idx", "quantile")))
        .withColumn("quantile", col("quantile").cast("float")),
      Some("""WITH q AS (SELECT l_returnflag,
             |  quantile_cont(l_extendedprice,
             |    [0.25, 0.5, 0.75, 0.95]) AS qs
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, CAST(i - 1 AS INTEGER) AS pct_idx,
             |  CAST(qs[i] AS FLOAT4) AS quantile
             |FROM q, generate_series(1, 4) t(i)""".stripMargin)),

    // Morton (Z-curve) clustering value over two part dimensions — the
    // multi-column data-skipping layout key (Layout.zOrderBy); pure
    // bit-interleave expression, reproduced bit-for-bit in the oracle
    QueryDef("q_zorder_value",
      (s, d) => Tables.part(s, d).select(col("p_partkey"),
        Layout.zValue(Seq(col("p_size"), col("p_partkey")), bits = 16)
          .as("z")),
      Some {
        val terms = (0 until 16).flatMap(i => Seq(
          s"(((CAST(p_size AS BIGINT) >> $i) & 1) << ${i * 2})",
          s"(((CAST(p_partkey AS BIGINT) >> $i) & 1) << ${i * 2 + 1})"))
        s"""SELECT p_partkey, ${terms.mkString(" | ")} AS z
           |FROM part""".stripMargin
      }),

    // file-stats data skipping (the Delta/Iceberg manifest analog):
    // write lineitem range-clustered on ship date into 8 files,
    // collect the per-file min/max manifest in one scan, answer a
    // one-quarter band via prunedRead — manifest-selected files plus
    // the exact residual filter. The oracle is the plain band
    // aggregate: skipping is an optimization, never a semantics
    // change. LayoutSpec pins that the manifest actually prunes
    // (candidate files ≪ total) and that edge bands return empty.
    QueryDef("q_file_skip",
      (s, d) => {
        val dir = fileSkipDirs.getOrElseUpdate(d, {
          val out = java.nio.file.Files
            .createTempDirectory("graft-skip-q").toString
          Tables.lineitem(s, d)
            .select(col("l_orderkey"),
              col("l_shipdate").cast("date").as("sd"), col("l_quantity"))
            .repartitionByRange(8, col("sd"))
            .write.mode("overwrite").parquet(out)
          out
        })
        val manifest = Layout.collectFileStats(s, dir, Seq("sd"))
        Layout.prunedRead(s, dir, manifest, "sd",
            lit("1994-01-01").cast("date"), lit("1994-03-31").cast("date"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(18, 2)))
              .cast("double").as("qty"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |  AS qty
             |FROM lineitem
             |WHERE CAST(l_shipdate AS DATE)
             |  BETWEEN DATE '1994-01-01' AND DATE '1994-03-31'""".stripMargin)),

    // date-function battery (P3/P8 extended): arithmetic, truncation,
    // calendar parts — DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday,
    // aligned with +1 in the oracle
    QueryDef("q_date_funcs",
      (s, d) => Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(lit("1998-12-31").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_end"),
        trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        dayofweek(col("o_orderdate").cast("date")).as("dow"),
        dayofyear(col("o_orderdate").cast("date")).as("doy"),
        weekofyear(col("o_orderdate").cast("date")).as("woy"),
        quarter(col("o_orderdate").cast("date")).as("qtr")),
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
             |CAST(o_orderdate AS DATE) + 30 AS plus30,
             |CAST(datediff('day', CAST(o_orderdate AS DATE),
             |  DATE '1998-12-31') AS INTEGER) AS days_to_end,
             |CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             |last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow,
             |CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS doy,
             |CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS woy,
             |CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS qtr
             |FROM orders""".stripMargin)),

    // array-function battery over tokenized part names (1-based
    // element_at in both engines; slice start/length vs start/end
    // aligned explicitly). Array results are serialized with
    // array_join so the hash compare sees scalar strings.
    // lambda higher-order functions (filter/transform/aggregate/
    // exists/forall) over the embedding arrays — the declarative
    // array-processing surface (CodegenFallback in Spark, hence the
    // custom expressions for HOT loops; this query pins the semantics).
    // The aggregate fold prepends the 0.0 init on BOTH engines so the
    // accumulation sequence — and therefore every IEEE rounding — is
    // identical.
    QueryDef("q_array_hof",
      (s, d) => Tables.embeddings(s, d).select(col("vec_id"),
        size(filter(col("embedding"), x => x > 0)).as("n_pos"),
        aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x)
          .as("emb_sum"),
        element_at(transform(col("embedding"), x => x * 2.0), 1)
          .as("first_doubled"),
        exists(col("embedding"), x => x > 3.0).as("any_gt3"),
        forall(col("embedding"), x => x > -100.0).as("all_gt_m100")),
      Some("""SELECT vec_id,
             |CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER)
             |  AS n_pos,
             |list_reduce(list_prepend(CAST(0.0 AS DOUBLE), embedding),
             |  (acc, x) -> acc + x) AS emb_sum,
             |CAST(list_transform(embedding, x -> x * 2.0)[1] AS DOUBLE)
             |  AS first_doubled,
             |len(list_filter(embedding, x -> x > 3.0)) > 0 AS any_gt3,
             |len(list_filter(embedding, x -> NOT (x > -100.0))) = 0
             |  AS all_gt_m100
             |FROM embeddings""".stripMargin)),

    QueryDef("q_array_funcs",
      (s, d) => {
        val words = split(col("p_name"), " ")
        Tables.part(s, d).select(col("p_partkey"),
          array_join(array_sort(words), ",").as("sorted_words"),
          element_at(words, 1).as("first_word"),
          array_contains(words, "green").as("has_green"),
          array_join(slice(words, 1, 2), ",").as("first_two"),
          array_join(reverse(words), ",").as("rev_words"),
          array_join(array_sort(array_distinct(words)), ",").as("uniq_words"),
          size(words).as("n_words"))
      },
      Some("""WITH w AS (SELECT p_partkey,
             |  string_split(p_name, ' ') AS words FROM part)
             |SELECT p_partkey,
             |array_to_string(list_sort(words), ',') AS sorted_words,
             |words[1] AS first_word,
             |list_contains(words, 'green') AS has_green,
             |array_to_string(list_slice(words, 1, 2), ',') AS first_two,
             |array_to_string(list_reverse(words), ',') AS rev_words,
             |array_to_string(list_sort(list_distinct(words)), ',') AS uniq_words,
             |CAST(len(words) AS INTEGER) AS n_words
             |FROM w""".stripMargin)),

    // null-handling battery: nullif/coalesce/greatest/least/CASE
    QueryDef("q_null_funcs",
      (s, d) => Tables.orders(s, d).select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("F")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("CLOSED"))
          .as("status_label"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
        least(col("o_totalprice"), lit(100000.0)).as("cap_price"),
        when(col("o_totalprice") > 200000.0, lit("big"))
          .when(col("o_totalprice") > 100000.0, lit("mid"))
          .otherwise(lit("small")).as("bucket")),
      Some("""SELECT o_orderkey,
             |nullif(o_orderstatus, 'F') AS status_or_null,
             |coalesce(nullif(o_orderstatus, 'F'), 'CLOSED') AS status_label,
             |greatest(o_totalprice, 100000.0) AS floor_price,
             |least(o_totalprice, 100000.0) AS cap_price,
             |CASE WHEN o_totalprice > 200000.0 THEN 'big'
             |WHEN o_totalprice > 100000.0 THEN 'mid'
             |ELSE 'small' END AS bucket
             |FROM orders""".stripMargin)),

    // Pearson correlation computed from EXACT decimal sums (Σx Σy Σxy
    // Σx² Σy² ride DECIMAL; the final formula runs on doubles cast
    // from exact values — deterministic at any parallelism, unlike the
    // streaming corr() aggregate whose merge order varies). Output
    // discipline learned the hard way: the statistic is emitted as
    // float32 (engines may fuse a*b-c*d with FMA → last-ulp double
    // drift), and the giant scale-4 product sums stay INTERNAL —
    // DuckDB's decimal→double conversion is not correctly rounded at
    // those magnitudes, while the scale-2 money sums convert exactly.
    // higher central moments (skewness, kurtosis) from raw power sums,
    // same discipline as q_manual_corr: the four power sums are EXACT
    // (l_quantity is integral — DECIMAL(7,0) powers stay well inside
    // both engines' 38-digit cap, and every sum is < 2^53 so the
    // double conversion is exact); the derived statistics divide as
    // doubles with the identical expression tree on both sides and
    // emit as float32 (FMA-fusion armor). The whole battery is ONE
    // aggregation pass — no second centered-moments scan.
    QueryDef("q_stats_moments",
      (s, d) => {
        val q = col("l_quantity").cast(DecimalType(7, 0))
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("__n"),
            sum(q).cast("double").as("__s1"),
            sum(q * q).cast("double").as("__s2"),
            sum(q * q * q).cast("double").as("__s3"),
            sum(q * q * q * q).cast("double").as("__s4"))
          .withColumn("__mu", col("__s1") / col("__n"))
          .withColumn("__m2",
            col("__s2") / col("__n") - col("__mu") * col("__mu"))
          .withColumn("__m3",
            col("__s3") / col("__n") -
              lit(3.0) * col("__mu") * (col("__s2") / col("__n")) +
              lit(2.0) * col("__mu") * col("__mu") * col("__mu"))
          .withColumn("__m4",
            col("__s4") / col("__n") -
              lit(4.0) * col("__mu") * (col("__s3") / col("__n")) +
              lit(6.0) * col("__mu") * col("__mu") * (col("__s2") / col("__n")) -
              lit(3.0) * col("__mu") * col("__mu") * col("__mu") * col("__mu"))
          .select(col("l_returnflag"),
            col("__n").cast("long").as("n"),
            col("__mu").as("mean_qty"),
            (col("__m3") / (col("__m2") * sqrt(col("__m2"))))
              .cast("float").as("skew_qty"),
            (col("__m4") / (col("__m2") * col("__m2")) - lit(3.0))
              .cast("float").as("kurt_qty"))
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |  CAST(COUNT(*) AS DOUBLE) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS s1,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS s2,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS s3,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))
             |    * CAST(l_quantity AS DECIMAL(7,0))) AS DOUBLE) AS s4
             |  FROM lineitem GROUP BY 1),
             |b AS (SELECT l_returnflag, n, s1 / n AS mu, s2, s3, s4
             |  FROM a),
             |c AS (SELECT l_returnflag, n, mu,
             |  s2 / n - mu * mu AS m2,
             |  s3 / n - 3.0 * mu * (s2 / n)
             |    + 2.0 * mu * mu * mu AS m3,
             |  s4 / n - 4.0 * mu * (s3 / n)
             |    + 6.0 * mu * mu * (s2 / n)
             |    - 3.0 * mu * mu * mu * mu AS m4
             |  FROM b)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n, mu AS mean_qty,
             |CAST(m3 / (m2 * sqrt(m2)) AS REAL) AS skew_qty,
             |CAST(m4 / (m2 * m2) - 3.0 AS REAL) AS kurt_qty
             |FROM c""".stripMargin)),

    QueryDef("q_manual_corr",
      (s, d) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(18, 2))
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("double").as("__n"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
            sum(dec(col("l_quantity")) * dec(col("l_extendedprice")))
              .cast("double").as("__sxy"),
            sum(dec(col("l_quantity")) * dec(col("l_quantity")))
              .cast("double").as("__sxx"),
            sum(dec(col("l_extendedprice")) * dec(col("l_extendedprice")))
              .cast("double").as("__syy"))
          .withColumn("corr_qty_price",
            // nullif guards the zero-variance group identically in
            // both engines (Spark's non-ANSI divide yields null,
            // DuckDB's IEEE divide yields inf — nullif normalizes)
            ((col("__n") * col("__sxy") - col("sum_qty") * col("sum_price")) /
              nullif(
                sqrt(col("__n") * col("__sxx") -
                  col("sum_qty") * col("sum_qty")) *
                sqrt(col("__n") * col("__syy") -
                  col("sum_price") * col("sum_price")),
                lit(0.0))).cast("float"))
          .select(col("l_returnflag"), col("__n").cast("long").as("n"),
            col("sum_qty"), col("sum_price"), col("corr_qty_price"))
      },
      Some("""WITH a AS (SELECT l_returnflag,
             |  CAST(COUNT(*) AS DOUBLE) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
             |    * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             |    * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             |sx AS sum_qty, sy AS sum_price,
             |CAST((n * sxy - sx * sy) /
             |  nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy),
             |    0.0) AS REAL) AS corr_qty_price
             |FROM a""".stripMargin)),

    // histogram binning: fixed-width buckets via floor(x / width) —
    // IEEE division is bit-identical cross-engine, so bucket edges
    // agree exactly; the one-scan shape of a numeric distribution
    // profile at any data size
    QueryDef("q_histogram_binning",
      (s, d) => Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long")
          .as("bucket"))
        .agg(count(lit(1)).as("n"),
          money(col("o_totalprice")).as("bucket_total")),
      Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT)
             |  AS bucket,
             |CAST(COUNT(*) AS BIGINT) AS n,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |  AS bucket_total
             |FROM orders GROUP BY 1""".stripMargin)),

    // full outer join: per-nation supplier vs customer counts — keys
    // existing on only one side survive with nulls on the other
    QueryDef("q_full_outer_join",
      (s, d) => {
        val sup = Tables.supplier(s, d).groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_suppliers"))
        val cust = Tables.customer(s, d)
          .filter(col("c_acctbal") > 9000.0)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_rich"))
        sup.join(cust, sup("s_nationkey") === cust("c_nationkey"),
          "full_outer")
          .select(coalesce(col("s_nationkey"), col("c_nationkey"))
            .as("nationkey"), col("n_suppliers"), col("n_rich"))
      },
      Some("""WITH s AS (SELECT s_nationkey,
             |  CAST(COUNT(*) AS BIGINT) AS n_suppliers
             |  FROM supplier GROUP BY 1),
             |c AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich
             |  FROM customer WHERE c_acctbal > 9000.0 GROUP BY 1)
             |SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
             |n_suppliers, n_rich
             |FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey"""
        .stripMargin)),

    // semi + anti join: customers with/without 1995 orders (EXISTS /
    // NOT EXISTS — Spark plans LeftSemi/LeftAnti, dim side broadcast)
    QueryDef("q_semi_anti_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o95 = Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1995)
        val semi = c.join(o95, c("c_custkey") === o95("o_custkey"),
          "left_semi").select(lit("semi").as("op"), col("c_custkey"))
        val anti = c.join(o95, c("c_custkey") === o95("o_custkey"),
          "left_anti").select(lit("anti").as("op"), col("c_custkey"))
        semi.unionByName(anti)
      },
      Some("""SELECT 'semi' AS op, c_custkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  AND year(o.o_orderdate) = 1995)
             |UNION ALL
             |SELECT 'anti' AS op, c_custkey FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  AND year(o.o_orderdate) = 1995)""".stripMargin)),

    // recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop): chain-walk
    // label assignment. Documents form linked chains inside each
    // (lang, source) group — bucketed every 32 rows so recursion depth
    // is bounded BY CONSTRUCTION at any corpus size (the scale-sound
    // shape: iterations are a design constant, not data-driven; the
    // unbounded-depth relative of this walk is
    // Dedup.connectedComponents' alternating label joins). Bench note:
    // UnionLoop's cost here is iteration-overhead-dominated (each tiny
    // step job pays ~90 ms fixed scheduling; per-iteration data cost
    // is negligible), so the walk STRIDES: the first 8 positions of
    // every bucket seed the loop (their chain head is the bucket's
    // first_value — the same label a 1-step walk would have carried
    // to them), and each recursive step follows lead(+8), covering
    // all 32 positions in 3 recursive joins instead of 31. Output is
    // row-identical to the naive 1-step walk — the oracle below IS
    // the naive walk (DuckDB's own WITH RECURSIVE), so the driver
    // compare enforces the equivalence every round rather than
    // trusting this comment.
    QueryDef("q_recursive_chains",
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("graft_rc_docs")
        s.sql("""
          |WITH RECURSIVE
          |seq AS (
          |  SELECT doc_id, lang, source,
          |    row_number() OVER (PARTITION BY lang, source
          |      ORDER BY doc_id) - 1 AS rn
          |  FROM graft_rc_docs),
          |links AS (
          |  SELECT doc_id, rn,
          |    first_value(doc_id) OVER (PARTITION BY lang, source,
          |      rn div 32 ORDER BY rn) AS head_id,
          |    lead(doc_id, 8) OVER (PARTITION BY lang, source, rn div 32
          |      ORDER BY rn) AS next_id
          |  FROM seq),
          |walk AS (
          |  SELECT head_id AS chain_head, doc_id, next_id
          |  FROM links WHERE rn % 32 < 8
          |  UNION ALL
          |  SELECT w.chain_head, l.doc_id, l.next_id
          |  FROM walk w JOIN links l ON l.doc_id = w.next_id
          |)
          |SELECT doc_id, chain_head FROM walk""".stripMargin)
      },
      Some("""WITH RECURSIVE
             |seq AS (
             |  SELECT doc_id, lang, source,
             |    row_number() OVER (PARTITION BY lang, source
             |      ORDER BY doc_id) - 1 AS rn
             |  FROM documents),
             |links AS (
             |  SELECT doc_id, rn,
             |    lead(doc_id) OVER (PARTITION BY lang, source, rn // 32
             |      ORDER BY rn) AS next_id
             |  FROM seq),
             |walk AS (
             |  SELECT doc_id AS chain_head, doc_id, next_id
             |  FROM links WHERE rn % 32 = 0
             |  UNION ALL
             |  SELECT w.chain_head, l.doc_id, l.next_id
             |  FROM walk w JOIN links l ON l.doc_id = w.next_id
             |)
             |SELECT doc_id, chain_head FROM walk""".stripMargin)),
  )
}
