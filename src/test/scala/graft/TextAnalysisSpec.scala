package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tokens/tokenCount edge cases") {
    val df = Seq("hello  world", "  ", "", "one").toDF("t")
    val counts = df.select(TextAnalysis.tokenCount($"t")).collect()
      .map(_.getInt(0)).toSeq
    assert(counts == Seq(2, 0, 0, 1))
  }

  test("punctRatio counts punctuation chars") {
    val r = Seq("a,b.c!").toDF("t")
      .select(TextAnalysis.punctRatio($"t")).collect().head.getDouble(0)
    assert(r == 3.0 / 6.0)
  }

  test("stopwordRatio and meanTokenLength") {
    val df = Seq("the cat sat on the mat").toDF("t")
    val r = df.select(
      TextAnalysis.stopwordRatio($"t"),
      TextAnalysis.meanTokenLength($"t")).collect().head
    assert(r.getDouble(0) == 2.0 / 6.0) // 'the' ×2
    assert(r.getDouble(1) == 17.0 / 6.0)
  }

  test("qualityScore stays in [0,1] (property over random strings)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const("the"),
      Gen.const("..."), Gen.const(" "))).map(_.mkString(" "))
    val prop = forAll(gen) { s =>
      val v = Seq(s).toDF("t")
        .select(TextAnalysis.qualityScore($"t")).collect().head.getDouble(0)
      v >= 0.0 && v <= 1.0
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("langId on genuine sentences") {
    val df = Seq(
      ("the cat is on the mat and the dog", "en"),
      ("der hund und die katze ist da", "de"),
      ("le chat et la souris est dans les champs", "fr"),
      ("el perro y los gatos es aqui", "es"),
      ("xyzzy plugh qwerty", "und")).toDF("t", "expected")
    val rows = df.select(TextAnalysis.langId($"t").as("got"), $"expected")
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got ${r.getString(0)} expected ${r.getString(1)}"))
  }

  test("contentFingerprint is whitespace/case-invariant, content-sensitive") {
    val df = Seq(
      ("Hello   World", "hello world", true),
      ("hello world", "hello worlds", false)).toDF("a", "b", "same")
    df.collect() // force
    val rows = df.select(
      (TextAnalysis.contentFingerprint($"a") ===
        TextAnalysis.contentFingerprint($"b")).as("eq"), $"same").collect()
    rows.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
  }

  test("rollingFingerprint is deterministic and text-sensitive") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox leaps")
      .toDF("t")
    val fps = df.select(TextAnalysis.rollingFingerprint($"t")).collect()
      .map(_.getLong(0))
    val fps2 = df.select(TextAnalysis.rollingFingerprint($"t")).collect()
      .map(_.getLong(0))
    assert(fps.toSeq == fps2.toSeq)
  }

  test("polyFingerprint matches the reference polynomial, marks short text") {
    // reference implementation of the base-31 mod-1e9+7 rolling hash
    def poly(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c.toLong) % 1000000007L)
    def expected(text: String): Long = {
      val w = text.trim.toLowerCase.split("\\s+")
      if (w.length < 3) -1L
      else w.sliding(3).map(g => poly(g.mkString(" "))).min
    }
    val texts = Seq("a b c d", "The Quick  Brown Fox jumps", "too short", "")
    val got = texts.toDF("t")
      .select(TextAnalysis.polyFingerprint($"t")).collect().map(_.getLong(0))
    assert(got.toSeq == texts.map(expected),
      s"got ${got.toSeq}, want ${texts.map(expected)}")
  }

  test("vocabulary and tfIdf on a tiny corpus") {
    val docs = Seq(
      (1L, "spark spark hash join"),
      (2L, "spark sort merge join"),
      (3L, "filter scan")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vocab("spark") == ((2L, 3L))) // df=2 docs, tf_total=3
    assert(vocab("join") == ((2L, 2L)))
    assert(vocab("scan") == ((1L, 1L)))
    val tfidf = TextAnalysis.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (tf, df, score) = tfidf((1L, "spark"))
    assert(tf == 2 && df == 2)
    assert(math.abs(score - 2.0 * math.log(3.0 / 2.0)) < 1e-12)
    // a corpus-wide token has idf 0 → tf_idf 0
    assert(tfidf((2L, "spark"))._3 == 1.0 * math.log(3.0 / 2.0))
  }

  test("repetitionRatio flags repeated n-grams, 0 for short/clean text") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),      // "a b c" loops: heavy repetition
      (2L, "one two three four five"), // all 3-grams distinct
      (3L, "too short"),               // < 3 tokens → no n-grams
      (4L, "")).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
      TextAnalysis.repetitionRatio($"text", 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 1: 7 total 3-grams, 3 distinct ("a b c","b c a","c a b")
    assert(math.abs(out(1L) - (1.0 - 3.0 / 7.0)) < 1e-15)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0 && out(4L) == 0.0)
  }

  test("text ops compile to pure expressions (single codegen stage)") {
    val df = Seq("the quick brown fox").toDF("text")
    val plan = df.select(TextAnalysis.qualityScore($"text"),
      TextAnalysis.langId($"text"), TextAnalysis.contentFingerprint($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF leaked into text-analysis plan:\n$plan")
  }

  test("topNgramStats: most frequent bigram, deterministic tie-break") {
    val docs = Seq(
      (1L, "a b a b a b"),     // "a b" ×3 beats "b a" ×2
      (2L, "x y y x"),         // all bigrams ×1 → tie → greatest: "y y"
      (3L, "solo"),            // < 2 tokens → dropped
      (4L, "one two one two")  // "one two" ×2, len 14 chars
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgramStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 4L))
    assert(out(1L) == (("a b", 3L, 9.0 / 11.0)))
    assert(out(2L) == (("y y", 1L, 3.0 / 7.0)))
    assert(out(4L) == (("one two", 2L, 14.0 / 15.0)))
    // narrow map: no exchange
    val plan = TextAnalysis.topNgramStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("ngramCoverage: exact fraction of reference-seen 3-grams") {
    val reference = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "pack my box with five dozen jugs")
    ).toDF("doc_id", "text")
    val docs = Seq(
      // grams: "the quick brown"(hit) "quick brown fox"(hit)
      //        "brown fox sleeps"(miss)
      (1L, "the quick brown fox sleeps"),
      (2L, "entirely novel text here"),       // 2 grams, 0 hits
      (3L, "to short")                        // < 3 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCoverage(docs, reference, "doc_id",
      "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 2L, 2.0 / 3.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
  }

  test("ngramCoverage counts distinct grams once despite repeats") {
    val reference = Seq((10L, "a b c")).toDF("doc_id", "text")
    // "a b c a b c": distinct 3-grams = {a b c, b c a, c a b} — the
    // repeated "a b c" window must not double-count
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.ngramCoverage(docs, reference, "doc_id",
      "text", n = 3).head
    assert((r.getLong(1), r.getLong(2)) == ((3L, 1L)))
  }
}
