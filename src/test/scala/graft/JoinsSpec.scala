package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins
import graft.util.Tables

class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("bloomPrunedJoin equals the plain inner join") {
    val lineitem = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val viaBloom = Joins.bloomPrunedJoin(lineitem, "l_orderkey",
        urgent, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = lineitem.join(urgent,
        lineitem("l_orderkey") === urgent("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaBloom == plain)
    assert(plain.nonEmpty)
  }

  test("bloomPrune actually prunes and keeps all true matches") {
    val large = spark.range(0, 100000).select(col("id").as("k"))
    val small = spark.range(0, 1000).select((col("id") * 100).as("k"))
    val pruned = Joins.bloomPrune(large, "k", small, "k",
      expectedItems = 1000L, fpp = 0.01)
    val n = pruned.count()
    // every true match survives (no false negatives — the Bloom
    // contract), and the pass rate is ~selectivity + fpp, far below
    // the unpruned size
    assert(n >= 1000L, s"dropped true matches: $n")
    assert(n <= 1000L + 5000L, s"barely pruned: $n of 100000")
    val ids = pruned.join(small, Seq("k"), "left_semi").count()
    assert(ids == 1000L)
  }

  test("bloomPrune aligns mismatched key types before hashing") {
    // int dimension key vs bigint fact key: xxhash64 hashes by physical
    // type, so without coercion every probe would miss and the "exact
    // superset of the semi-join" contract would silently break
    val large = spark.range(0, 1000).select(col("id").as("k"))     // bigint
    val small = Seq(1, 5, 7).toDF("k")                             // int
    val pruned = Joins.bloomPrune(large, "k", small, "k",
      expectedItems = 10L)
    val kept = pruned.collect().map(_.getLong(0)).toSet
    assert(Set(1L, 5L, 7L).subsetOf(kept), s"pruned true matches: $kept")
    // same but with the mismatch on the other side, via the full join
    val joined = Joins.bloomPrunedJoin(small.toDF("k"), "k",
      large.limit(10), "k")
    assert(joined.count() == 3L)
    // string-vs-bigint: the join compares via DOUBLE coercion, so "05"
    // matches 5 — the bloom must follow the COMPARISON coercion, not
    // the "wider" type (string), or it hashes join-equal values apart
    val strKeys = Seq("05", "7", "900").toDF("k")
    val viaStr = Joins.bloomPrune(large, "k", strKeys, "k",
      expectedItems = 10L)
    val keptStr = viaStr.collect().map(_.getLong(0)).toSet
    assert(Set(5L, 7L, 900L).subsetOf(keptStr),
      s"comparison-coerced matches pruned: $keptStr")
    // incomparable key types fail loudly instead of silently pruning
    val bin = Seq(Array[Byte](1)).toDF("k")
    intercept[IllegalArgumentException] {
      Joins.bloomPrune(large, "k", bin, "k", expectedItems = 10L)
    }
  }

  test("bloomPrune null keys and probe stays in the scan stage") {
    val large = Seq[(java.lang.Long, String)]((1L, "a"), (null, "x"),
      (2L, "b")).toDF("k", "v")
    val small = Seq(1L).toDF("k")
    val pruned = Joins.bloomPrune(large, "k", small, "k",
      expectedItems = 10L)
    assert(pruned.select("v").collect().map(_.getString(0)).toSet
      == Set("a"))
    // the probe is a plain filter over the scan — no join, no shuffle
    // (asserted on a parquet-backed frame; a local relation gets
    // constant-folded away entirely)
    val filePruned = Joins.bloomPrune(Tables.lineitem(spark, sf),
      "l_orderkey", Seq(1L).toDF("k"), "k", expectedItems = 10L)
    val plan = filePruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("saltedJoin equals the plain inner join with both paths active") {
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    val supplier = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"))
    // per-supplier counts span ~545-640 with median ~600 at this SF;
    // a threshold of 602 splits the keys across hot and cold paths
    val salted = Joins.saltedJoin(lineitem, "l_suppkey", supplier,
        "s_suppkey", saltBuckets = 4, hotThreshold = 602L)
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val plain = lineitem.join(supplier,
        lineitem("l_suppkey") === supplier("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    // multiset equality — a lost or duplicated row must fail
    assert(salted.sorted.toSeq == plain.sorted.toSeq)
    assert(plain.nonEmpty)
    // both paths genuinely exercised at this threshold
    val counts = lineitem.groupBy("l_suppkey").count().collect()
      .map(_.getLong(1))
    assert(counts.exists(_ >= 602L) && counts.exists(_ < 602L),
      "threshold does not split keys: adjust the spec's hotThreshold")
  }

  test("saltedJoin handles same-named keys and overlapping columns") {
    // the common equi-join spelling: both keys named "k", plus a
    // non-key column name shared by both sides — the plain join
    // accepts both, so the drop-in replacement must too
    val fact = Seq((1L, "f1"), (1L, "f2"), (1L, "f3"), (2L, "f4"))
      .toDF("k", "name")
    val dim = Seq((1L, "d1"), (2L, "d2"), (3L, "d3")).toDF("k", "name")
    val salted = Joins.saltedJoin(fact, "k", dim, "k",
      saltBuckets = 3, hotThreshold = 3L)
    // output mirrors the plain join: fact columns then dim columns,
    // duplicate names preserved
    assert(salted.columns.toSeq == Seq("k", "name", "k", "name"))
    val got = salted.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).sorted.toSeq
    val want = fact.join(dim, fact("k") === dim("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // reserved internal names are refused loudly
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(fact.withColumnRenamed("name", "__salt"), "k",
        dim, "k", saltBuckets = 2, hotThreshold = 1L)
    }
  }

  test("saltedJoin equals the plain join on random skewed data (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // keys drawn from a small domain so duplicates and hot keys arise
    // naturally; thresholds/buckets vary so hot/cold splits differ
    val prop = forAll(
      Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 99))),
      Gen.listOfN(8, Gen.chooseNum(0L, 7L)),
      Gen.chooseNum(2, 5), Gen.chooseNum(1L, 25L)) { (fs, ds, buckets, thresh) =>
      val fact = fs.toDF("k", "p").repartition(3)
      val dim = ds.distinct.map(k => (k, s"d$k")).toDF("k", "name")
      val got = Joins.saltedJoin(fact, "k", dim, "k", buckets, thresh)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getString(3))).sorted.toSeq
      val want = fact.join(dim, fact("k") === dim("k"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getString(3))).sorted.toSeq
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("saltedJoin replicates only hot dim rows and reuses one build") {
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_extendedprice"))
    val supplier = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"))
    val salted = Joins.saltedJoin(lineitem, "l_suppkey", supplier,
      "s_suppkey", saltBuckets = 4, hotThreshold = 602L)
    val plan = salted.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the dim replication is a generate (explode), not a cross join
    assert(plan.contains("Generate"), plan)
    // all salt columns are dropped from the result
    assert(!salted.columns.contains("__salt"))
    assert(salted.columns.toSeq ==
      Seq("l_suppkey", "l_extendedprice", "s_suppkey", "s_name"))
  }

  test("rangeLookupJoin equals the naive BETWEEN join, without a " +
      "nested loop") {
    import spark.implicits._
    val fact = Seq((1L, 5L), (2L, 99L), (3L, 100L), (4L, 250L),
      (5L, 9999L), (6L, 10000L)).toDF("id", "v")
    // overlapping bands + an inverted interval that must match nothing
    val dim = Seq(("a", 0L, 99L), ("b", 100L, 499L), ("c", 50L, 250L),
      ("bad", 500L, 400L)).toDF("cls", "lo", "hi")
    val got = Joins.rangeLookupJoin(fact, "v", dim, "lo", "hi",
        binWidth = 100L)
      .select("id", "cls").collect().map(r =>
        (r.getLong(0), r.getString(1))).sorted.toSeq
    val naive = fact.join(dim, $"v" >= $"lo" && $"v" <= $"hi")
      .select("id", "cls").collect().map(r =>
        (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == naive)
    assert(got.contains((2L, "a")) && got.contains((2L, "c"))) // overlap
    assert(!got.exists(_._2 == "bad"))
    assert(!got.exists(_._1 == 6L)) // out of every band
    val plan = Joins.rangeLookupJoin(fact, "v", dim, "lo", "hi", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("joinCardinality predicts the ACTUAL join output exactly — " +
      "skewed keys, null keys, non-matching keys, empty side") {
    import spark.implicits._
    // left: key 1 ×5 (the hot key), key 2 ×2, key 9 unmatched, nulls
    val l = Seq(1, 1, 1, 1, 1, 2, 2, 9).map(k => (k, "l"))
      .toDF("k", "p").union(Seq((null.asInstanceOf[Integer], "l"))
        .toDF("k", "p"))
    // right: key 1 ×3, key 2 ×1, key 7 unmatched, null
    val r = Seq(1, 1, 1, 2, 7).map(k => (k, "r")).toDF("k", "p")
      .union(Seq((null.asInstanceOf[Integer], "r")).toDF("k", "p"))
    val pred = Joins.joinCardinality(l, "k", r, "k").collect().head
    val actual = l.join(r.withColumnRenamed("p", "p2"), "k").count()
    assert(pred.getLong(0) == actual)             // 5*3 + 2*1 = 17
    assert(pred.getLong(0) == 17L)
    assert(pred.getLong(1) == 9L && pred.getLong(2) == 6L) // totals
    assert(pred.getLong(3) == 2L)                 // matching keys
    assert(pred.getLong(4) == 15L)                // hot key product
    assert(pred.getLong(5) == 17L * 1000 / 9)     // blowup ratio
    // empty side: zero everywhere, no nulls from the empty aggregate
    val e = Joins.joinCardinality(l, "k", r.filter(lit(false)), "k")
      .collect().head
    assert(e.getLong(0) == 0L && e.getLong(3) == 0L &&
      e.getLong(4) == 0L && e.getLong(5) == 0L)
  }
}
