package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Boilerplate

class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("duplicateSegmentStats: Gopher fractions over newline lines") {
    val docs = Seq(
      (1L, "alpha beta\ngamma\nalpha beta\ndelta"), // 4 lines, 1 repeat
      (2L, "one\ntwo\nthree"),                      // no repeats
      (3L, "x\n \n\nx\nx"),                         // blanks drop; x ×3
      (4L, "   \n  ")                               // no segments → dropped
    ).toDF("doc_id", "text")
    val out = Boilerplate
      .duplicateSegmentStats(docs, "doc_id", "text", "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // doc 1: 4 occurrences, 3 distinct; chars 10+5+10+5=30, distinct 20
    assert(out(1L) == ((4L, 3L, 0.25, 10.0 / 30.0)))
    assert(out(2L) == ((3L, 3L, 0.0, 0.0)))
    // doc 3: 3 occurrences of "x", 1 distinct
    assert(out(3L) == ((3L, 1L, 2.0 / 3.0, 2.0 / 3.0)))
  }

  test("stripBoilerplate: frequent lines removed, order kept") {
    // "footer" in 3 docs, "header" in 2, unique bodies in 1 each
    val docs = Seq(
      (1L, "header\nbody one\nfooter"),
      (2L, "header\nbody two\nfooter\nbody two b"),
      (3L, "body three\nfooter")
    ).toDF("doc_id", "text")
    val out = Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "\n", minDocs = 3)
      .orderBy("doc_id").collect()
    // only "footer" reaches df>=3
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("boiler_segs") == 1L)
    assert(byId(1L).getAs[String]("clean_text") == "header\nbody one")
    assert(byId(2L).getAs[String]("clean_text") ==
      "header\nbody two\nbody two b")
    assert(byId(3L).getAs[String]("clean_text") == "body three")
    assert(byId(3L).getAs[Long]("n_segs") == 2L)
    assert(byId(3L).getAs[Long]("boiler_chars") == 6L)
    assert(byId(3L).getAs[Long]("total_chars") == 16L)
    assert(byId(3L).getAs[Double]("boiler_char_frac") == 6.0 / 16.0)
    // at minDocs = 2 "header" qualifies too
    val strict = Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "\n", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(strict(0).getAs[String]("clean_text") == "body one")
    assert(strict(1).getAs[Long]("boiler_segs") == 2L)
  }

  test("stripBoilerplate: within-doc repeats count once toward df") {
    // "spam" appears 3× in doc 1 but only doc 1 carries it → df = 1,
    // never boilerplate at minDocs = 2
    val docs = Seq(
      (1L, "spam\nspam\nspam\nreal"),
      (2L, "other\nreal")
    ).toDF("doc_id", "text")
    val out = Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "\n", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("boiler_segs") == 1L) // just "real"
    assert(out(0).getAs[String]("clean_text") == "spam\nspam\nspam")
  }

  test("stripBoilerplate: shuffle-join fallback matches broadcast") {
    val docs = (1L to 40L).map(i =>
      (i, s"common line\nunique body $i")).toDF("doc_id", "text")
    def run(bc: Boolean) = Boilerplate
      .stripBoilerplate(docs, "doc_id", "text", "\n", minDocs = 10,
        broadcastFrequent = bc)
      .orderBy("doc_id")
      .select("doc_id", "boiler_segs", "clean_text")
      .collect().toSeq
    assert(run(bc = true) == run(bc = false))
  }

  test("segments quotes the delimiter literally") {
    val df = Seq((1L, "a.b|c.d")).toDF("id", "t")
    val segs = df.select(
      Boilerplate.segments(col("t"), ".").as("s")).head.getSeq[String](0)
    assert(segs == Seq("a", "b|c", "d")) // '.' is NOT any-char
  }

  test("duplicateSegmentStats matches a plain-Scala reference (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val lineGen = Gen.oneOf("alpha", "beta b", "gamma ray", " ", "",
      "alpha", "delta x y") // dup-heavy vocab, blanks included
    val docGen = Gen.listOfN(8, Gen.listOf(lineGen).map(_.mkString("\n")))
    val prop = forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Boilerplate
        .duplicateSegmentStats(docs, "doc_id", "text", "\n")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val segs = t.split(java.util.regex.Pattern.quote("\n"), -1)
          .map(_.trim).filter(_.nonEmpty).toSeq
        if (segs.isEmpty) None
        else {
          val u = segs.distinct
          val (c, uc) = (segs.map(_.length.toLong).sum,
            u.map(_.length.toLong).sum)
          Some(i.toLong -> ((segs.length.toLong, u.length.toLong,
            (segs.length - u.length).toDouble / segs.length,
            (c - uc).toDouble / c)))
        }
      }.toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("topNgramStats matches a plain-Scala reference (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val wordGen = Gen.oneOf("a", "b", "cc", "dd")
    val docGen = Gen.listOfN(6,
      Gen.listOf(wordGen).map(_.mkString(" ")))
    val prop = forAll(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.text.TextAnalysis
        .topNgramStats(docs, "doc_id", "text", n = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val w = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        if (w.length < 2) None
        else {
          val grams = w.sliding(2).map(_.mkString(" ")).toSeq
          val counts = grams.groupBy(identity).view.mapValues(_.length)
          // max count, tie → lexicographically greatest gram
          val (g, c) = counts.toSeq.maxBy { case (g, c) => (c, g) }
          Some(i.toLong -> ((g, c.toLong,
            c.toDouble * g.length / t.trim.length)))
        }
      }.toMap
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("charDiversity: exact Gini on known histograms") {
    val docs = Seq(
      (1L, "aaaa"),     // one symbol → gini 0
      (2L, "abab"),     // two symbols 2+2 → 1 - 8/16 = 0.5
      (3L, "abcd"),     // uniform 4 → 1 - 4/16 = 0.75
      (4L, "")          // dropped
    ).toDF("doc_id", "text")
    val out = Boilerplate.charDiversity(docs, "doc_id", "text")
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L) == ((4L, 2L, 0.5)))
    assert(out(3L) == ((4L, 4L, 0.75)))
  }
}
