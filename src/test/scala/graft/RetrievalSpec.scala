package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark spark engine"),        // high tf for 'spark'
    (2L, "spark engine"),                    // 'spark' once, short doc
    (3L, "engine engine engine engine engine engine engine engine"),
    (4L, "vector search engine"),
    (5L, "")                                 // empty doc
  ).toDF("doc_id", "text")

  test("bm25 ranks higher-tf docs first and respects tie-break by id") {
    val r = Retrieval.bm25(docs, "doc_id", "text",
      terms = Seq("spark", "vector"), topK = 10).collect()
    val ids = r.map(_.getLong(0)).toSeq
    // docs 1, 2, 4 match; 3 and 5 don't
    assert(ids.toSet == Set(1L, 2L, 4L))
    val byId = r.map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // doc 1 (tf=3) beats doc 2 (tf=1) for the same term
    assert(byId(1L) > byId(2L))
    // every returned score is positive and finite
    assert(byId.values.forall(v => v > 0.0 && !v.isNaN && !v.isInfinite))
    // matched-term counts: docs 1 and 2 match 1 term, doc 4 matches 1
    val matches = r.map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(matches == Map(1L -> 1, 2L -> 1, 4L -> 1))
  }

  test("bm25 matches a hand-computed score on a 2-doc corpus") {
    val two = Seq((1L, "a b"), (2L, "a a a a")).toDF("doc_id", "text")
    val r = Retrieval.bm25(two, "doc_id", "text", terms = Seq("a"),
      k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // n=2, df=2, dl: doc1=2 doc2=4, avgdl=3
    def score(tf: Double, dl: Double): Double = {
      val idf = math.log(1.0 + ((2.0 - 2.0) + 0.5) / (2.0 + 0.5))
      val raw = idf * ((tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 3.0))))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(r(1L) == score(1.0, 2.0))
    assert(r(2L) == score(4.0, 4.0))
  }

  test("bm25 rejects empty and duplicate term lists") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(docs, "doc_id", "text", terms = Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25(docs, "doc_id", "text", terms = Seq("a", "a"))
    }
  }

  test("hashEmbed buckets by the portable polynomial hash") {
    import graft.text.TextAnalysis
    // hand-compute: hash("ab") = (0*31+97)*31+98 = 3105 (mod 1e9+7
    // no-op at this size); bucket = 3105 % 8 = 1
    def poly(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)
    // "ce" (not "cd": poly("cd") - poly("ab") = 64, a bucket collision
    // at any power-of-two dim ≤ 64 — the hashing trick colliding as
    // designed)
    val v = Seq("ab ab ce").toDF("t")
      .select(Retrieval.hashEmbed(TextAnalysis.tokens($"t"), 8))
      .as[Seq[Double]].head()
    assert(v.length == 8)
    assert(v.sum == 3.0) // one count per token
    assert(v((poly("ab") % 8).toInt) == 2.0)
    assert(v((poly("ce") % 8).toInt) == 1.0)
    // identical texts embed identically; cosine of identical = 1
    val c = Seq(("ab cd", "ab cd"), ("ab ab", "zz zz"))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosine_sim(
        Retrieval.hashEmbed(TextAnalysis.tokens($"a"), 8),
        Retrieval.hashEmbed(TextAnalysis.tokens($"b"), 8)))
      .as[Double].collect()
    assert(c(0) == 1.0)
    assert(c(1) <= 1.0) // disjoint vocab → 0 unless buckets collide
  }

  test("native hashEmbed equals the composable HOF twin (property, " +
      "incl. multi-byte tokens)") {
    import graft.text.TextAnalysis
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val tokGen = Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.oneOf("é日", "𝄞x", "a-b."))).map(_.mkString(" "))
    val prop = forAll(tokGen) { text =>
      val df = Seq(text).toDF("t")
      val native = df.select(Retrieval.hashEmbed(
        TextAnalysis.tokens($"t"), 16)).as[Seq[Double]].head()
      val composed = df.select(Retrieval.hashEmbedComposed(
        TextAnalysis.tokens($"t"), 16)).as[Seq[Double]].head()
      native == composed
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("hashEmbed skips null tokens like the composable twin") {
    val df = spark.sql("SELECT array('ab', CAST(NULL AS STRING), 'ab') AS t")
    val native = df.select(Retrieval.hashEmbed($"t", 8))
      .as[Seq[Double]].head()
    val composed = df.select(Retrieval.hashEmbedComposed($"t", 8))
      .as[Seq[Double]].head()
    assert(native == composed)
    assert(native.sum == 2.0) // the null token counts toward nothing
  }

  test("chunkSliding covers every token with the expected windows") {
    // 100 tokens, size 40 stride 30 → chunks at 0, 30, 60 (3 windows)
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val r = Retrieval.chunkSliding(Seq((7L, text)).toDF("id", "t"),
      "id", "t", size = 40, stride = 30)
      .orderBy("chunk_id").collect()
    assert(r.length == 3)
    assert(r.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(r.map(_.getInt(2)).toSeq == Seq(40, 40, 40))
    // chunk 2 starts at token 61 and ends at w100
    val last = r(2).getString(3).split(" ")
    assert(last.head == "w61" && last.last == "w100")
    // overlap: chunk 0 ends at w40, chunk 1 starts at w31
    assert(r(0).getString(3).split(" ").last == "w40")
    assert(r(1).getString(3).split(" ").head == "w31")
  }

  test("chunkSliding edge cases: short doc, exact fit, tail, empty") {
    val d = Seq(
      (1L, (1 to 5).map(i => s"t$i").mkString(" ")),  // shorter than size
      (2L, (1 to 40).map(i => s"t$i").mkString(" ")), // exact fit → 1 chunk
      (3L, (1 to 41).map(i => s"t$i").mkString(" ")), // one over → 2 chunks
      (4L, "")                                        // empty → none
    ).toDF("id", "t")
    val counts = Retrieval.chunkSliding(d, "id", "t", 40, 30)
      .groupBy("doc_id").count().collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    // the tail chunk of doc 3 holds tokens 31..41 (11 tokens)
    val tail = Retrieval.chunkSliding(d, "id", "t", 40, 30)
      .filter($"doc_id" === 3 && $"chunk_id" === 1).collect().head
    assert(tail.getInt(2) == 11)
    assert(tail.getString(3).startsWith("t31 ") &&
      tail.getString(3).endsWith(" t41"))
  }

  test("charGramVec: subword similarity is graded — shared trigrams " +
      "score between identical and disjoint tokens") {
    def cos(a: String, b: String): Double = spark.range(1).select(
      graft.functions.VectorFunctions.cosine_sim(
        Retrieval.charGramVec(lit(a)), Retrieval.charGramVec(lit(b)))
        .as("c")).head().getDouble(0)
    assert(math.abs(cos("sparks", "sparks") - 1.0) < 1e-12)
    // at dim=64 unrelated short tokens still collide into shared
    // buckets (random sparse histograms have nonzero expected cosine),
    // so assert the graded ORDER with a margin, not absolute smallness
    val near = cos("sparks", "spark") // shares <sp, spa, par, ark
    val far = cos("sparks", "merge")
    assert(near > far + 0.2 && near > 0.7, s"near=$near far=$far")
  }

  test("maxSimRerank: brute-force maxsim agreement on the candidate " +
      "set; ranks dense, score order deterministic") {
    val corpus = Seq(
      (1L, "spark vector merge pipeline"),   // all three query tokens
      (2L, "spark vectors merged pipeline"), // 1 exact + 2 variants
      (3L, "spark spark spark spark"),       // one exact token, high tf
      (4L, "database index scan"),           // no exact term: NEVER a
                                             // candidate (BM25 stage)
      (5L, "vector vector store")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "vector", "merge")
    val got = Retrieval.maxSimRerank(corpus, "doc_id", "text", terms,
      candidates = 5, topK = 5)
    val rows = got.collect()
    assert(rows.map(_.getInt(2)).toSeq == (1 to rows.length))
    // two-stage semantics: a doc with zero exact query terms never
    // reaches the reranker, however close its subwords
    assert(!rows.map(_.getLong(0)).contains(4L))
    // brute force with the operator's exact arithmetic
    def vec(tok: String): Array[Double] = spark.range(1)
      .select(Retrieval.charGramVec(lit(tok)).as("v"))
      .head().getSeq[Double](0).toArray
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
        i += 1
      }
      // exactly the operator's formula: dot / sqrt(sx*sy)
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    // brute force over the CANDIDATE set (docs holding ≥1 exact term)
    val want = Seq(
      1L -> "spark vector merge pipeline",
      2L -> "spark vectors merged pipeline",
      3L -> "spark spark spark spark",
      5L -> "vector vector store").map { case (id, text) =>
      val dvs = text.split("\\s+").distinct.map(vec)
      val su = terms.map(t => dvs.map(dv =>
        math.floor(cosine(dv, vec(t)) * 1e15).toLong).max).sum
      id -> su
    }.sortBy { case (id, su) => (-su, id) }
    assert(rows.map(_.getLong(0)).toSeq == want.map(_._1),
      s"got ${rows.map(_.getLong(0)).toSeq} want ${want.map(_._1)}")
    // the full-match doc wins; the variant doc (vectors/merged ≈
    // vector/merge by subword mass) outranks the single-token docs —
    // the point of late interaction over plain BM25
    assert(rows.head.getLong(0) == 1L)
    val pos = rows.map(_.getLong(0)).zipWithIndex.toMap
    assert(pos(2L) < pos(3L) && pos(2L) < pos(5L))
    intercept[IllegalArgumentException] {
      Retrieval.maxSimRerank(corpus, "doc_id", "text", terms,
        candidates = 2, topK = 5)
    }
  }
}
