package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("sample membership is stable across runs and repartitioning") {
    val a = Sampling.deterministicSample(ids, "id", 30)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids.repartition(13), "id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // roughly the requested fraction (hash uniformity)
    assert(a.size > 2000 * 0.2 && a.size < 2000 * 0.4, s"${a.size}")
  }

  test("splitByHash partitions every row into exactly one split") {
    val s = Sampling.splitByHash(ids, "id", trainPct = 90)
    assert(s.count() == 2000)
    val byName = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet == Set("train", "eval"))
    assert(byName("train") + byName("eval") == 2000)
    assert(byName("train") > 1600) // ~90%
    // pct=0 and pct=100 edge cases
    assert(Sampling.deterministicSample(ids, "id", 0).count() == 0)
    assert(Sampling.deterministicSample(ids, "id", 100).count() == 2000)
  }

  test("split assignment is a narrow map (no shuffle)") {
    val plan = Sampling.splitByHash(ids, "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratifiedSample takes exact per-stratum quotas, deterministically") {
    val df = (1L to 100L).map(i => (i, if (i <= 70) "en" else "de"))
      .toDF("id", "lang")
    val sampled = Sampling.stratifiedSample(df, "lang", "id", 0.2)
    val byLang = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 14L, "de" -> 6L)) // ceil(.2*70), ceil(.2*30)
    // membership is a pure function of the data: identical under
    // repartitioning
    val a = sampled.collect().map(_.getLong(0)).toSet
    val b = Sampling.stratifiedSample(df.repartition(17), "lang", "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // edge fractions
    assert(Sampling.stratifiedSample(df, "lang", "id", 0.0).count() == 0)
    assert(Sampling.stratifiedSample(df, "lang", "id", 1.0).count() == 100)
  }

  test("splitByGroup keeps whole near-dup clusters in one split") {
    // real clustering: minhash pairs over the documents fixture, then
    // split on the cluster label — no cluster may straddle the
    // train/eval boundary (the leakage case per-row splitting allows)
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = graft.dedup.Dedup.minHashPairs(docs, "doc_id", "text",
      threshold = 0.3)
    val clusters = graft.dedup.Dedup.connectedComponents(pairs)
    val labeled = docs.join(clusters,
        docs("doc_id") === clusters("id"), "left")
      .withColumn("grp", coalesce(col("cluster"), col("doc_id")))
    val split = Sampling.splitByGroup(labeled, "grp", trainPct = 70)
    val straddling = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("nsplits"))
      .filter(col("nsplits") > 1).count()
    assert(straddling == 0)
    // both splits are populated and assignment is deterministic
    val sizes = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "eval"), sizes.toString)
    val again = Sampling.splitByGroup(labeled.repartition(11), "grp", 70)
      .filter(col("split") === "train").count()
    assert(again == sizes("train"))
    graft.dedup.Dedup.releaseCaches()
  }

  test("mixToTokenBudget takes each group's token share greedily, " +
      "deterministically, and drops unweighted groups") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tokens"))
    val weights = Map("en" -> 0.6, "de" -> 0.24, "zh" -> 0.16)
    val total = 10000L
    val mixed = Sampling.mixToTokenBudget(docs, "doc_id", "lang",
      "n_tokens", weights, total)
    val byLang = mixed.groupBy("lang")
      .agg(sum(col("n_tokens")).as("toks"),
        max(col("n_tokens")).as("maxDoc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // only weighted groups appear
    assert(byLang.keySet == weights.keySet, byLang.keySet.toString)
    // greedy take: total tokens reach the target and overshoot by
    // LESS than one document (the boundary doc is included)
    weights.foreach { case (g, w) =>
      val target = (w * total).toLong
      val (toks, maxDoc) = byLang(g)
      assert(toks >= target, s"$g under budget: $toks < $target")
      assert(toks < target + maxDoc,
        s"$g overshot by a full doc: $toks vs $target (+$maxDoc)")
    }
    // deterministic under any partitioning
    val again = Sampling.mixToTokenBudget(docs.repartition(13), "doc_id",
      "lang", "n_tokens", weights, total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == mixed.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("kFold: complete, disjoint, roughly balanced, partition-stable") {
    val df = (0L until 500L).toDF("id")
    val folds = Sampling.kFold(df, "id", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(folds.size == 500) // every row assigned exactly once
    assert(folds.values.toSet == Set(0, 1, 2, 3, 4))
    val sizes = folds.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(n => n > 50 && n < 150), sizes.toMap)
    val again = Sampling.kFold(df.repartition(11), "id", 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again == folds)
    intercept[IllegalArgumentException] { Sampling.kFold(df, "id", 1) }
  }

  test("assignBalancedShards: totals within one max weight, " +
      "deterministic under repartitioning") {
    // skewed weights (power-law-ish), the case naive round-robin or
    // hash-assignment handles badly
    val df = (1L to 1000L).map(i => (i, 1000000L / i))
      .toDF("id", "tokens")
    val n = 8
    val out = Sampling.assignBalancedShards(df, "id", "tokens", n)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 1000)
    assert(rows.map(_._3).toSet == (0 until n).toSet)
    val totals = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val maxW = rows.map(_._2).max
    assert(totals.values.max - totals.values.min <= maxW,
      s"imbalance ${totals.values.max - totals.values.min} > max " +
        s"weight $maxW: ${totals.toMap}")
    // pure rank arithmetic: identical on any partitioning
    val again = Sampling
      .assignBalancedShards(df.repartition(13), "id", "tokens", n)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(again == rows.map(r => r._1 -> r._3).toMap)
    intercept[IllegalArgumentException] {
      Sampling.assignBalancedShards(df, "id", "tokens", 0)
    }
  }

  test("dsirResample: target-domain docs rise, deterministic under " +
      "repartitioning, short docs excluded") {
    // two disjoint vocabularies: "target-ish" docs repeat target
    // bigrams, "raw-ish" docs repeat filler bigrams; a handful mix.
    val tgtText = "solar panels convert sunlight into power"
    val rawText = "random filler noise padding words here"
    val docs = (
      (1L to 20L).map(i => (i, s"$tgtText batch $i", true)) ++
      (21L to 80L).map(i => (i, s"$rawText batch $i", false)) ++
      (81L to 90L).map(i => (i, s"$tgtText $rawText $i", false)) ++
      Seq((91L, "one", false), (92L, "   ", false)) // <2 tokens: no bigrams
    ).toDF("id", "text", "is_tgt")
    val top = Sampling.dsirResample(docs, "id", "text",
      isTarget = col("is_tgt"), buckets = 64, k = 30)
    val ids = top.collect().map(_.getLong(0))
    assert(ids.length == 30)
    // the 20 pure-target docs and the 10 mixed docs outrank pure-raw
    assert(ids.toSet == ((1L to 20L) ++ (81L to 90L)).toSet)
    assert(!ids.contains(91L) && !ids.contains(92L))
    // integer scores: exact same result on any partitioning
    val again = Sampling.dsirResample(docs.repartition(7), "id", "text",
      isTarget = col("is_tgt"), buckets = 64, k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = top.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == first)
    intercept[IllegalArgumentException] {
      Sampling.dsirResample(docs, "id", "text", col("is_tgt"), buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.dsirResample(docs, "id", "text", col("is_tgt"), k = 0)
    }
  }

  test("weightedPrioritySample: exact brute-force cut, heavy rows " +
      "favored, deterministic under repartitioning, top-k plan") {
    val rows = (1L to 1000L).map(i => (i, if (i <= 100) 1000 else 1))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedPrioritySample(df, "id", "w", k = 50)
    // brute-force reference with the operator's exact arithmetic
    val hash = (id: Long) => id.toString.foldLeft(0L)(
      (acc, ch) => (acc * 31 + ch.toInt) % 1000000007L)
    val want = rows.map { case (id, w) =>
      (id, w.toDouble / ((hash(id) + 1).toDouble / 1000000007.0))
    }.sortBy { case (id, p) => (-p, id) }.take(50).map(_._1).toSet
    assert(got.collect().map(_.getLong(0)).toSet == want)
    // the 100 heavy rows (1000× weight) dominate a 50-row sample
    assert(got.collect().map(_.getLong(0)).count(_ <= 100) >= 45)
    // partition invariance (bit-stable priorities + id tie-break)
    val rep = Sampling.weightedPrioritySample(df.repartition(7),
      "id", "w", 50).collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rep.toSet ==
      got.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet)
    // no global sort materializes: per-partition top-k + k-row merge
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    intercept[IllegalArgumentException] {
      Sampling.weightedPrioritySample(df, "id", "w", 0)
    }
  }

  test("diverseSample keeps the quota most-central vectors per cell, " +
      "deterministically under repartitioning") {
    // two tight clusters around orthogonal axes plus per-id jitter —
    // centrality ordering within a cell is unambiguous
    val vecs = (0L until 40L).map { i =>
      val axis = if (i % 2 == 0) 0 else 1
      val jitter = 0.01 * (i / 2 % 10)
      val v = Array.tabulate(4)(d =>
        (if (d == axis) 1.0 else 0.0) + (if (d == 3) jitter else 0.0))
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val model = graft.similarity.Ivf.train(vecs, "vec_id", "embedding",
      k = 2, iters = 2)
    val got = Sampling.diverseSample(vecs, "vec_id", "embedding",
      model, quota = 3).collect()
    // exactly quota rows per non-empty cell, ranks 1..quota
    val byCell = got.groupBy(_.getInt(1))
    assert(byCell.size == 2)
    byCell.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
    }
    // brute-force reference: per assigned cell, top-3 by (cosine to
    // own centroid desc, id asc) — recompute assignment + centrality
    // through the SAME operator expressions on a single row each
    val all = Sampling.diverseSample(vecs, "vec_id", "embedding",
      model, quota = Int.MaxValue).collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getLong(0)))
    val want = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(t => (-t._2, t._3)).take(3).map(t => (t._3, t._1)).toSeq
    }.toSet
    assert(got.map(r => (r.getLong(0), r.getInt(1))).toSet == want)
    // partitioning invariance
    val rep = Sampling.diverseSample(vecs.repartition(7), "vec_id",
      "embedding", model, quota = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(rep == got.map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getInt(3))).toSet)
    intercept[IllegalArgumentException] {
      Sampling.diverseSample(vecs, "vec_id", "embedding", model, 0)
    }
  }

  test("temperatureSample: sqrt allocation upweights the tail, caps " +
      "at group size, replays the integer closed form") {
    // 900 "en", 100 "sw", 4 "yi" docs
    val docs = ((1 to 900).map(i => (i.toLong, "en")) ++
      (1001 to 1100).map(i => (i.toLong, "sw")) ++
      (2001 to 2004).map(i => (i.toLong, "yi")))
      .toDF("doc_id", "lang").repartition(7)
    val total = 100L
    val out = Sampling.temperatureSample(docs, "lang", "doc_id", total)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the documented closed form: floor base + caps, then the
    // floor shortfall dealt by largest remainder to uncapped groups
    val counts = Map("en" -> 900L, "sw" -> 100L, "yi" -> 4L)
    val qi = counts.view.mapValues(c =>
      math.floor(math.sqrt(c.toDouble) * 1e6).toLong).toMap
    val sq = qi.values.sum
    val base = counts.map { case (g, c) =>
      g -> math.min(c, total * qi(g) / sq) }
    val seats = total - base.values.sum
    val order = counts.keys.toSeq
      .filter(g => base(g) < counts(g))
      .sortBy(g => (-(total * qi(g) % sq), g))
    val want = base.map { case (g, n) =>
      g -> (n + (if (order.indexOf(g) >= 0 &&
        order.indexOf(g) < seats) 1L else 0L)) }
    assert(out == want, s"got $out want $want")
    // no cap binds except yi's, and yi's base already sat below its
    // cap — the draw is exactly `total`
    assert(out.values.sum == total,
      s"largest-remainder must close the floor shortfall, got $out")
    // α = 0.5 beats proportional for the low-resource groups
    assert(want("sw") > 100 * 100 / 1004,
      "sqrt sampling must upweight sw vs proportional")
    assert(want("yi") <= 4L) // capped at group size
    // deterministic under repartitioning
    val out2 = Sampling
      .temperatureSample(docs.repartition(3), "lang", "doc_id", total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out1 = Sampling.temperatureSample(docs, "lang", "doc_id", total)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out1 == out2)
  }

  test("groupTopK/groupTopQuota equal the window form exactly and " +
      "stay deterministic under repartitioning") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    val docs = (1 to 500).map(i =>
      (i.toLong, if (i % 10 == 0) "de" else "en", rnd.nextInt(1000)))
      .toDF("id", "g", "w").repartition(9)
    // brute-force reference: the plain window
    val w = Window.partitionBy(col("g"))
      .orderBy(col("w").desc, col("id").asc)
    val ref = docs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val got = Sampling.groupTopK(docs, "g", "id", Seq(("w", true)), 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(got == ref)
    val again = Sampling
      .groupTopK(docs.repartition(3), "g", "id", Seq(("w", true)), 7)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == ref)
    // per-group quotas: en keeps 3, de keeps 5; groups without a
    // quota row are dropped
    val quotas = Seq(("en", 3L), ("de", 5L)).toDF("g", "q")
    val refQ = docs.withColumn("rank", row_number().over(w).cast("long"))
      .join(quotas, Seq("g")).filter(col("rank") <= col("q"))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val gotQ = Sampling.groupTopQuota(docs, "g", "id",
        Seq(("w", true)), quotas, "q")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(gotQ == refQ)
    assert(Sampling.groupTopQuota(docs, "g", "id", Seq(("w", true)),
      quotas.filter(col("g") === "de"), "q").select("g")
      .distinct().collect().map(_.getString(0)).toSeq == Seq("de"))
  }

  test("temperatureSample: NULL group is a real stratum and draws " +
      "its allocation") {
    val docs = ((1 to 64).map(i => (i.toLong, "en")) ++
      (101 to 136).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("doc_id", "lang").repartition(5)
    val out = Sampling.temperatureSample(docs, "lang", "doc_id", 50L)
      .groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // closed form: q_en = floor(8*1e6), q_null = floor(6*1e6);
    // bases 28 + 21 leave one remainder seat, and en's remainder
    // (400e6 mod 14e6 = 8e6) beats null's (6e6) — en takes it
    assert(out(Some("en")) == 50L * 8000000L / 14000000L + 1L)
    assert(out(None) == 50L * 6000000L / 14000000L,
      s"null stratum must be sampled, got $out")
    assert(out.values.sum == 50L)
  }
}
