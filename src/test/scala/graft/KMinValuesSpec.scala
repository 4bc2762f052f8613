package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvFunctions.{kmv_distinct, kmv_estimate, kmv_hash48, kmv_jaccard, kmv_sketch, kmv_union}

class KMinValuesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("under-filled sketch is exact regardless of duplication") {
    val df = (1 to 1000).map(i => ("g", (i % 7).toLong))
      .toDF("g", "v").repartition(9)
    val est = df.groupBy("g")
      .agg(kmv_distinct(kmv_hash48(col("v")), k = 16).as("e"))
      .head.getLong(1)
    assert(est == 7L) // 7 distinct < k → sketch holds them all
  }

  test("estimate equals the closed form over the k-th smallest hash") {
    val n = 500
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("g", "v")
      .repartition(11) // force partial sketches + merges + spill codec
    val k = 32
    val est = df.groupBy("g")
      .agg(kmv_distinct(kmv_hash48(col("v")), k).as("e"))
      .head.getLong(1)
    // replay the definition with plain Scala md5
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = (1 to n).map { i =>
      val hex = md.digest(s"value-$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }.distinct.sorted
    val expected = ((k - 1).toLong << 48) / hashes(k - 1)
    assert(est == expected)
    // and the estimate is in the right ballpark (stderr ~ 1/sqrt(k-2))
    assert(est > n / 2 && est < n * 2, s"estimate $est vs true $n")
  }

  test("order/partitioning independence: same set, same estimate") {
    val vals = (1 to 300).map(i => s"doc-$i")
    val a = vals.map(("g", _)).toDF("g", "v").repartition(3)
    val b = scala.util.Random.shuffle(vals).map(("g", _))
      .toDF("g", "v").repartition(17)
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(kmv_distinct(kmv_hash48(col("v")), 24).as("e"))
      .head.getLong(1)
    assert(run(a) == run(b))
  }

  test("nulls are skipped; estimate stays bounded state") {
    val df = Seq(("g", Some("x")), ("g", None), ("g", Some("y")))
      .toDF("g", "v")
    val est = df.groupBy("g")
      .agg(kmv_distinct(kmv_hash48(col("v")), 8).as("e"))
      .head.getLong(1)
    assert(est == 2L)
  }

  test("estimate matches the closed-form replay on random value sets " +
      "(property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash48(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    val k = 8
    val prop = forAll(Gen.listOf(Gen.chooseNum(0, 500))) { xs =>
      val vals = xs.map(i => s"item-$i")
      val df = ("g" +: vals).drop(1).map(("g", _)).toDF("g", "v")
        .repartition(5)
      val got =
        if (vals.isEmpty) -1L
        else df.groupBy("g")
          .agg(kmv_distinct(kmv_hash48(col("v")), k).as("e"))
          .head.getLong(1)
      val hs = vals.map(hash48).distinct.sorted
      val want =
        if (vals.isEmpty) -1L
        else if (hs.length < k) hs.length.toLong
        else ((k - 1).toLong << 48) / hs(k - 1)
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("kmv_sketch returns the k smallest distinct hashes, sorted; " +
      "kmv_estimate over it equals kmv_distinct") {
    val df = (1 to 300).map(i => ("g", s"v-${i % 120}"))
      .toDF("g", "v").repartition(9)
    val row = df.groupBy("g").agg(
      kmv_sketch(kmv_hash48(col("v")), 16).as("s"),
      kmv_distinct(kmv_hash48(col("v")), 16).as("e")).head
    val sketch = row.getSeq[Long](1)
    assert(sketch.length == 16)
    assert(sketch == sketch.sorted && sketch.distinct == sketch)
    // the array IS the k smallest of the true hash set
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until 120).map { i =>
      val hex = md.digest(s"v-$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }.distinct.sorted.take(16)
    assert(sketch == hs)
    // reading the estimate off the stored sketch = the direct UDAF
    val est = df.groupBy("g")
      .agg(kmv_sketch(kmv_hash48(col("v")), 16).as("s"))
      .select(kmv_estimate(col("s"), 16).as("e")).head.getLong(0)
    assert(est == row.getLong(2))
  }

  test("sketch algebra is EXACT while everything fits under k") {
    // |A u B| = 9 < k = 16: the union sketch holds the whole union,
    // so Jaccard and union estimates are exact, not approximate
    val a = (1 to 6).map(i => ("a", s"x-$i")) // x-1..x-6
    val b = (4 to 9).map(i => ("b", s"x-$i")) // x-4..x-9, overlap 3
    val df = (a ++ b).toDF("g", "v").repartition(4)
    val sk = df.groupBy("g")
      .agg(kmv_sketch(kmv_hash48(col("v")), 16).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val two = Seq((sk("a").toArray, sk("b").toArray)).toDF("sa", "sb")
    val row = two.select(
      kmv_jaccard(col("sa"), col("sb"), 16).as("j"),
      kmv_estimate(kmv_union(col("sa"), col("sb"), 16), 16).as("u"))
      .head
    assert(row.getDouble(0) == 3.0 / 9.0)
    assert(row.getLong(1) == 9L)
  }

  test("kmv_jaccard lands near the true overlap on filled sketches") {
    val k = 64
    val a = (1 to 400).map(i => ("a", s"doc-$i"))
    val b = (201 to 600).map(i => ("b", s"doc-$i")) // true J = 200/600
    val df = (a ++ b).toDF("g", "v").repartition(7)
    val sk = df.groupBy("g")
      .agg(kmv_sketch(kmv_hash48(col("v")), k).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val j = Seq((sk("a").toArray, sk("b").toArray)).toDF("sa", "sb")
      .select(kmv_jaccard(col("sa"), col("sb"), k)).head.getDouble(0)
    val trueJ = 200.0 / 600.0
    assert(math.abs(j - trueJ) < 0.2, s"estimate $j vs true $trueJ")
  }

  test("non-BIGINT input fails analysis, not mid-stage; overflowing " +
      "parameters fail fast on every path") {
    val df = Seq(("g", 1)).toDF("g", "v") // IntegerType input
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(kmv_distinct(col("v"), 8).as("e")).collect()
    }
    assert(ex.getMessage.contains("BIGINT"), ex.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(kmv_sketch(col("v"), 8).as("s")).collect()
    }
    // (k-1) << domainBits overflow: aggregate and stored-sketch read
    // paths must both refuse (a silent wrap returns negative counts)
    intercept[IllegalArgumentException] {
      kmv_distinct(col("v"), k = 100000, domainBits = 48)
    }
    intercept[IllegalArgumentException] {
      kmv_estimate(col("v"), k = 100000, domainBits = 48)
    }
  }

  test("kmv_sample keeps the k lexicographically-smallest (hash, value) " +
      "pairs; quantiles are genuinely observed values") {
    import graft.functions.KmvFunctions.{kmv_sample, kmv_sample_quantile}
    val n = 300
    val df = (1 to n).map(i => ("g", i.toLong, (i * 7 % 100).toDouble))
      .toDF("g", "id", "v").repartition(9)
    val row = df.groupBy("g")
      .agg(kmv_sample(kmv_hash48(col("id")), col("v"), 32).as("sk"))
      .select(col("sk"), kmv_sample_quantile(col("sk"), 0.5).as("p50"),
        kmv_sample_quantile(col("sk"), 0.9).as("p90")).head
    // replay: scala-side md5 bottom-32 pairs
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash48(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(12), 16)
    val pairs = (1 to n).map(i => (hash48(i.toString), (i * 7 % 100).toDouble))
      .distinct.sorted.take(32)
    val got = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got == pairs)
    val vs = pairs.map(_._2).sorted
    assert(row.getDouble(1) == vs(math.floor(0.5 * 31).toInt))
    assert(row.getDouble(2) == vs(math.floor(0.9 * 31).toInt))
    assert(vs.contains(row.getDouble(1)) && vs.contains(row.getDouble(2)))
  }

  test("kmv_sample union of per-group samples == the global sample " +
      "(bottom-k-of-union is lossless), under-filled sample is exact") {
    import graft.functions.KmvFunctions.{kmv_sample, kmv_sample_quantile, kmv_sample_union}
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toLong, i.toDouble))
      .toDF("g", "id", "v").repartition(11)
    val h = kmv_hash48(col("id"))
    val per = df.groupBy("g").agg(kmv_sample(h, col("v"), 24).as("sk"))
    // re-aggregate the stored per-group sketches: explode + kmv_sample
    val viaUnion = per.select(explode(col("sk")).as("e"))
      .agg(kmv_sample(col("e.h"), col("e.v"), 24).as("g"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    val direct = df.agg(kmv_sample(h, col("v"), 24).as("g"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaUnion == direct)
    // pairwise array-builtin union agrees with the aggregate form
    val sks = per.collect().map(r => r.getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getLong(0), x.getDouble(1)))).toSeq
    val two = Seq((sks(0), sks(1))).toDF("sa", "sb")
    val u = two.select(kmv_sample_union(col("sa"), col("sb"), 24).as("u"))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(u == (sks(0) ++ sks(1)).distinct.sorted.take(24))
    // under-filled: 5 rows < k -> the sample IS the data, quantile exact
    val small = (1 to 5).map(i => ("g", i.toLong, i * 10.0))
      .toDF("g", "id", "v")
    val p50 = small.groupBy("g")
      .agg(kmv_sample(kmv_hash48(col("id")), col("v"), 64).as("sk"))
      .select(kmv_sample_quantile(col("sk"), 0.5)).head.getDouble(0)
    assert(p50 == 30.0)
  }

  test("kmv_sample: order/partition independence, null skip, " +
      "type-check failures at analysis") {
    import graft.functions.KmvFunctions.kmv_sample
    val vals = (1 to 200).map(i => (i.toLong, i * 1.5))
    val a = vals.map { case (i, v) => ("g", i, v) }.toDF("g", "id", "v")
      .repartition(3)
    val b = scala.util.Random.shuffle(vals).map { case (i, v) => ("g", i, v) }
      .toDF("g", "id", "v").repartition(17)
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(kmv_sample(kmv_hash48(col("id")), col("v"), 16).as("sk"))
      .head.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(run(a) == run(b))
    // nulls skipped on either side
    val withNulls = Seq(("g", Some(1L), Some(1.0)), ("g", None, Some(2.0)),
      ("g", Some(3L), None), ("g", Some(4L), Some(4.0)))
      .toDF("g", "id", "v")
    val n = withNulls.groupBy("g")
      .agg(kmv_sample(kmv_hash48(col("id")), col("v"), 8).as("sk"))
      .select(size(col("sk"))).head.getInt(0)
    assert(n == 2)
    // wrong types fail analysis, not mid-stage
    val bad = Seq(("g", 1, "x")).toDF("g", "id", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy("g").agg(kmv_sample(col("id"), lit(1.0), 8)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.groupBy("g")
        .agg(kmv_sample(kmv_hash48(col("id")), col("v"), 8)).collect()
    }
  }

  test("kmv_join_size: exact while under-filled, within SRS error when " +
      "scaled, and a pure function of the stored sketches") {
    import graft.functions.KmvFunctions.{kmv_join_size, kmv_sample}
    // side A: 50 keys with count = key%5+1; side B: keys 26..75, count 2
    val ca = (1 to 50).map(i => (i.toLong, (i % 5 + 1).toDouble))
    val cb = (26 to 75).map(i => (i.toLong, 2.0))
    val trueSize = ca.filter(_._1 >= 26).map(_._2 * 2.0).sum.toLong
    def sketch(rows: Seq[(Long, Double)], k: Int) = rows
      .toDF("key", "c").repartition(7)
      .agg(kmv_sample(kmv_hash48(col("key")), col("c"), k).as("sk"))
    // k = 128 > 75 distinct keys: union under-filled -> EXACT size
    val a128 = sketch(ca, 128).select(col("sk").as("sa"))
    val b128 = sketch(cb, 128).select(col("sk").as("sb"))
    val got = a128.crossJoin(b128)
      .select(kmv_join_size(col("sa"), col("sb"), 128)).head.getLong(0)
    assert(got == trueSize, s"under-filled estimate $got != $trueSize")
    // k = 16 < 75: scaled path; SRS bound is loose at k=16, assert
    // ballpark (within 4x) + determinism across partitionings
    val a16 = sketch(ca, 16).select(col("sk").as("sa"))
    val b16 = sketch(scala.util.Random.shuffle(cb), 16)
      .select(col("sk").as("sb"))
    val est = a16.crossJoin(b16)
      .select(kmv_join_size(col("sa"), col("sb"), 16)).head.getLong(0)
    assert(est > trueSize / 4 && est < trueSize * 4,
      s"scaled estimate $est vs true $trueSize")
    val est2 = a16.crossJoin(b16)
      .select(kmv_join_size(col("sa"), col("sb"), 16)).head.getLong(0)
    assert(est == est2)
    // self-join pricing: sum of squared counts, exact when under-filled
    val selfTrue = ca.map(p => p._2 * p._2).sum.toLong
    val gotSelf = a128.select(kmv_join_size(col("sa"), col("sa"), 128))
      .head.getLong(0)
    assert(gotSelf == selfTrue)
  }

  test("checked variants: oversized k on FULL sketches raises; " +
      "under-filled and k <= build_k pass through unchanged") {
    import graft.functions.KmvFunctions.{kmv_union_checked,
      kmv_join_size_checked, kmv_sample_union_checked}
    // two sketches built at k=8 over >8 distinct values — FULL at 8
    val full8 = (1 to 100).map(i => ("a", s"x-$i")).toDF("g", "v")
      .groupBy("g").agg(kmv_sketch(kmv_hash48(col("v")), 8).as("s"),
        lit(8).as("bk"))
    val both = full8.select(col("s").as("sa"), col("bk").as("ka"))
      .crossJoin(full8.select(col("s").as("sb"), col("bk").as("kb")))
    // sound read: k == build_k — identical to the unchecked union
    val ok = both.select(
      kmv_union_checked(col("sa"), col("ka"), col("sb"), col("kb"), 8)
        .as("u"),
      kmv_union(col("sa"), col("sb"), 8).as("u0")).head
    assert(ok.getSeq[Long](0) == ok.getSeq[Long](1))
    // truncated-tail read: k=16 > build_k=8 on a FULL sketch → raise
    val e = intercept[Exception] {
      both.select(kmv_union_checked(col("sa"), col("ka"),
        col("sb"), col("kb"), 16)).collect()
    }
    assert(e.getMessage.contains("build_k"), e.getMessage)
    // under-filled at build_k: 5 distinct values under k=8 — a k=16
    // union is EXACT and must NOT raise (the case that makes a
    // bare-array guard unsound)
    val under = (1 to 5).map(i => ("a", s"y-$i")).toDF("g", "v")
      .groupBy("g").agg(kmv_sketch(kmv_hash48(col("v")), 8).as("s"),
        lit(8).as("bk"))
    val u2 = under.select(col("s").as("sa"), col("bk").as("ka"))
      .crossJoin(under.select(col("s").as("sb"), col("bk").as("kb")))
      .select(kmv_union_checked(col("sa"), col("ka"),
        col("sb"), col("kb"), 16).as("u")).head.getSeq[Long](0)
    assert(u2.length == 5)
    // the sample/join-size siblings enforce the same contract
    import graft.functions.KmvFunctions.kmv_sample
    val samp8 = (1 to 100).map(i => ("a", i.toLong, i.toDouble))
      .toDF("g", "id", "c")
      .groupBy("g").agg(kmv_sample(kmv_hash48(col("id")), col("c"), 8)
        .as("s"), lit(8).as("bk"))
    val sboth = samp8.select(col("s").as("sa"), col("bk").as("ka"))
      .crossJoin(samp8.select(col("s").as("sb"), col("bk").as("kb")))
    val e2 = intercept[Exception] {
      sboth.select(kmv_join_size_checked(col("sa"), col("ka"),
        col("sb"), col("kb"), 16)).collect()
    }
    assert(e2.getMessage.contains("build_k"), e2.getMessage)
    val e3 = intercept[Exception] {
      sboth.select(kmv_sample_union_checked(col("sa"), col("ka"),
        col("sb"), col("kb"), 16)).collect()
    }
    assert(e3.getMessage.contains("build_k"), e3.getMessage)
    // sound join-size read still works through the checked wrapper
    val js = sboth.select(kmv_join_size_checked(col("sa"), col("ka"),
      col("sb"), col("kb"), 8)).head.getLong(0)
    assert(js > 0L)
  }

  test("kmv_join_size raises loud on duplicate key hashes regardless " +
      "of spark.sql.mapKeyDedupPolicy") {
    import graft.functions.KmvFunctions.kmv_join_size
    // hand-built sample with a duplicated hash (two 'distinct keys'
    // colliding) — must raise the explicit duplicate-hash error even
    // under LAST_WIN, where map_from_entries would silently drop one
    val dup = spark.sql(
      """SELECT array(named_struct('h', CAST(1 AS BIGINT),
        |                          'v', CAST(2.0 AS DOUBLE)),
        |             named_struct('h', CAST(1 AS BIGINT),
        |                          'v', CAST(3.0 AS DOUBLE))) AS s"""
        .stripMargin)
    val prev = spark.conf.getOption("spark.sql.mapKeyDedupPolicy")
    try {
      spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      val e = intercept[Exception] {
        dup.select(kmv_join_size(col("s"), col("s"), 4)).collect()
      }
      assert(e.getMessage.contains("duplicate 48-bit"), e.getMessage)
    } finally prev.fold(
      spark.conf.unset("spark.sql.mapKeyDedupPolicy"))(
      spark.conf.set("spark.sql.mapKeyDedupPolicy", _))
  }

  test("per-group isolation under a grouped aggregate") {
    val df = (1 to 400).map(i => (s"g${i % 4}", s"t-$i"))
      .toDF("g", "v").repartition(7)
    val out = df.groupBy("g")
      .agg(countDistinct(col("v")).as("nd"),
        kmv_distinct(kmv_hash48(col("v")), 16).as("e"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4)
    out.foreach { case (g, nd, e) =>
      assert(nd == 100L)
      assert(e > 40L && e < 250L, s"group $g estimate $e for nd=$nd")
    }
  }
}
