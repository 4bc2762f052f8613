package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetJoin
import graft.text.TextAnalysis

class SetJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Fixture stressing the filter paths: exact dupes, high/low
    * overlap, stopword-heavy docs (the prefix ordering must not pair
    * them on 'the'), containment (small doc inside big doc), length
    * mismatches the length filter must prune, case/whitespace noise,
    * and repeated tokens (set semantics). */
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "The quick  brown fox jumps over the lazy dog",  // dup of 1
    3L -> "the quick brown fox jumps over the lazy cat",   // 1 token off
    4L -> "the the the the the quick",                      // stopwordy
    5L -> "quick brown",                                    // inside 1
    6L -> "entirely different vocabulary about spark engines",
    7L -> "spark engines about vocabulary different entirely", // perm of 6
    8L -> "a b c d e f g h i j k l m n o p",
    9L -> "a b c d e f g h i j k l m n o q",               // 1 off vs 8
    10L -> "zzz",                                           // singleton
    11L -> "   ",                                           // empty after trim
    12L -> "the of and to in is it for on as"               // all-stopword
  )

  private def bruteJaccard(t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.toDF("id", "text")
      .select(col("id"),
        array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("toks"))
      .filter(size(col("toks")) > 0)
    sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.toks"), col("b.toks")))
          .cast("double") /
          size(array_union(col("a.toks"), col("b.toks")))
            .cast("double")).as("j"))
      .filter(col("j") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  private def bruteContainment(t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.toDF("id", "text")
      .select(col("id"),
        array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("toks"))
      .filter(size(col("toks")) > 0)
    sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.toks"), col("b.toks")))
          .cast("double") / size(col("a.toks")).cast("double")).as("c"))
      .filter(col("c") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  private def opJaccard(t: Double): Set[(Long, Long, Double)] =
    SetJoin.jaccardJoin(docs.toDF("id", "text"), "id", "text", t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("jaccardJoin equals brute force at t=0.5") {
    val expected = bruteJaccard(0.5)
    assert(expected.nonEmpty)            // dup + near-dup pairs exist
    assert(expected.exists(_._3 < 1.0))  // non-trivial similarity too
    assert(opJaccard(0.5) == expected)
  }

  test("jaccardJoin equals brute force at t=0.8 and t=0.3") {
    assert(opJaccard(0.8) == bruteJaccard(0.8))
    assert(opJaccard(0.3) == bruteJaccard(0.3))
  }

  test("permuted and repeated tokens are set-equal (jaccard 1.0)") {
    val pairs = opJaccard(1.0)
    assert(pairs.contains((1L, 2L, 1.0)))  // case/whitespace dup
    assert(pairs.contains((6L, 7L, 1.0)))  // permutation dup
  }

  test("containmentJoin equals brute force at t=1.0 and t=0.6") {
    val exact = bruteContainment(1.0)
    assert(exact.contains((5L, 1L, 1.0)))  // "quick brown" inside doc 1
    assert(exact.contains((5L, 2L, 1.0)))
    val got = SetJoin
      .containmentJoin(docs.toDF("id", "text"), "id", "text", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == exact)
    val got06 = SetJoin
      .containmentJoin(docs.toDF("id", "text"), "id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got06 == bruteContainment(0.6))
  }

  test("containment is asymmetric: the big doc is not inside the small") {
    val got = SetJoin
      .containmentJoin(docs.toDF("id", "text"), "id", "text", 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((5L, 1L)))
    assert(!got.contains((1L, 5L)))
  }

  test("thresholds outside (0, 1] are rejected loudly") {
    val df = docs.toDF("id", "text")
    intercept[IllegalArgumentException] {
      SetJoin.jaccardJoin(df, "id", "text", 0.0)
    }
    intercept[IllegalArgumentException] {
      SetJoin.containmentJoin(df, "id", "text", 1.5)
    }
    intercept[IllegalArgumentException] {
      SetJoin.prefixBucketStats(df, "id", "text", -0.1)
    }
  }

  test("prefixBucketStats exposes a boilerplate family's hot bucket " +
      "and lower thresholds lengthen prefixes") {
    // 20 clones sharing one body + a unique marker each, 5 singletons
    val family = (100L until 120L).map(i =>
      i -> s"shared body words repeat across every clone marker$i")
    val single = (200L until 205L).map(i =>
      i -> s"unique${i}a unique${i}b unique${i}c unique${i}d")
    val df = (family ++ single).toDF("id", "text")
    val stats = SetJoin.prefixBucketStats(df, "id", "text", 0.9)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // family docs: 8 distinct tokens → prefix len 8-8+1+1... at t=0.9
    // ceil(.9*8)=8 → prefLen 1, but the marker (df=1) fills slot 1 and
    // greatest(...,1) keeps it ≥1 — the marker is each clone's rarest.
    // At t=0.9 the family does NOT collide (the exact join is safe)...
    assert(stats.forall(_._2 <= 1L) || stats.head._2 < 20L, stats.toSeq)
    // ...at t=0.5 prefixes lengthen (prefLen 5) and the shared words
    // ENTER them: the family bucket appears at its full size
    val loose = SetJoin.prefixBucketStats(df, "id", "text", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(loose.head._2 == 20L, loose.take(3).toSeq)
    // candidate-pair pre-flight arithmetic: Σ b·(b-1)/2 over buckets
    val pairs = loose.map { case (_, b) => b * (b - 1) / 2 }.sum
    assert(pairs >= 20L * 19 / 2, pairs)
  }

  test("jaccardJoin equals brute force on the documents fixture") {
    val sf = "/root/testdata/sf0.001"
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val sets = docsDf.select(col("id"),
        array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("toks"))
      .filter(size(col("toks")) > 0)
    val expected = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        (size(array_intersect(col("a.toks"), col("b.toks")))
          .cast("double") /
          size(array_union(col("a.toks"), col("b.toks")))
            .cast("double")).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val got = SetJoin.jaccardJoin(docsDf, "id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  /** The 12-doc fixture and the testdata corpus both have vocabularies
    * under 64, so they exercise the small-vocab mask path. This corpus
    * crosses the 64-token boundary on purpose (100+ distinct tokens)
    * so the GENERAL array path keeps its own brute-force parity pin —
    * overlapping doc families plus per-doc unique markers give
    * non-trivial jaccard/containment structure at several thresholds. */
  private val wideVocab: Seq[(Long, String)] = {
    val shared = (0 until 30).map(i => s"common$i")
    (0L until 40L).map { i =>
      val fam = shared.slice((i % 4).toInt * 5, (i % 4).toInt * 5 + 12)
      i -> (fam ++ Seq(s"uniq${i}a", s"uniq${i}b")).mkString(" ")
    } ++ (100L until 140L).map(i =>
      i -> s"solo${i}a solo${i}b solo${i}c common${i % 30}")
  }

  test("general (large-vocab) path equals brute force — jaccard") {
    val df = wideVocab.toDF("id", "text")
    val sets = df.select(col("id"),
        array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("toks"))
      .filter(size(col("toks")) > 0)
    // sanity: this corpus must actually take the general path
    assert(sets.select(explode(col("toks"))).distinct().count() > 64)
    for (t <- Seq(0.9, 0.6)) {
      val expected = sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id"),
          (size(array_intersect(col("a.toks"), col("b.toks")))
            .cast("double") /
            size(array_union(col("a.toks"), col("b.toks")))
              .cast("double")).as("j"))
        .filter(col("j") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val got = SetJoin.jaccardJoin(df, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == expected, s"jaccard t=$t")
    }
    assert(SetJoin.jaccardJoin(df, "id", "text", 0.6).count() > 0)
  }

  test("general (large-vocab) path equals brute force — containment") {
    val df = wideVocab.toDF("id", "text")
    val sets = df.select(col("id"),
        array_sort(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("toks"))
      .filter(size(col("toks")) > 0)
    for (t <- Seq(1.0, 0.8, 0.5)) {
      val expected = sets.as("a").crossJoin(sets.as("b"))
        .filter(col("a.id") =!= col("b.id"))
        .select(col("a.id"), col("b.id"),
          (size(array_intersect(col("a.toks"), col("b.toks")))
            .cast("double") / size(col("a.toks")).cast("double"))
            .as("c"))
        .filter(col("c") >= t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val got = SetJoin.containmentJoin(df, "id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == expected, s"containment t=$t")
    }
  }
}
