package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Bpe
import graft.text.Bpe.{BpeMerge, BpeModel}

/** BPE training and segmentation vs an independent driver-side
  * reference implementation. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference BPE (independent of the Spark implementation): greedy
    * left-to-right single pass per merge. */
  private def refApply(syms: Vector[String], l: String,
      r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(words: Map[String, Long],
      n: Int): Vector[(String, String, Long)] = {
    var cur = words.map { case (w, c) =>
      w.toVector.map(_.toString) -> c }.toVector
    val merges = Vector.newBuilder[(String, String, Long)]
    var k = 0
    var stop = false
    while (k < n && !stop) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      cur.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c }
      }
      if (counts.isEmpty || counts.values.max < 2) stop = true
      else {
        val ((l, r), c) = counts.toVector
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += ((l, r, c))
        cur = cur.map { case (syms, cc) => refApply(syms, l, r) -> cc }
        k += 1
      }
    }
    merges.result()
  }

  test("applyMerge is greedy left-to-right, non-overlapping") {
    val df = Seq("aaa", "aaaa", "abab", "ba").toDF("w")
      .select(col("w"), Bpe.applyMerge(Bpe.chars(col("w")), "a", "a")
        .as("s"))
    val m = df.collect().map(r =>
      r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(m("aaa") == Seq("aa", "a"))
    assert(m("aaaa") == Seq("aa", "aa"))
    assert(m("abab") == Seq("a", "b", "a", "b"))
    assert(m("ba") == Seq("b", "a"))
  }

  test("learnMerges matches the reference implementation on a " +
      "hand-sized corpus") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.split("\\s+")).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val expected = refLearn(words, 6)
    val got = Bpe.learnMerges(docs, "text", nMerges = 6)
    assert(got.merges.map(m => (m.left, m.right, m.count)) == expected)
    assert(got.merges.map(_.rank) == (1 to got.merges.length))
    // counts are non-increasing (each new pair's frequency is bounded
    // by the occurrences of the pair that created its symbol)
    val cs = got.merges.map(_.count)
    assert(cs.zip(cs.drop(1)).forall { case (a, b) => a >= b })
  }

  test("batched selection survives the tie-trap: a pair the batch " +
      "creates ties an existing count and wins the lex tie-break") {
    // counts: (a,z)=(z,z)=(m,m)=50. Sequential: (a,z) → the created
    // (az,z) still counts 50 and "az" < "m" → (az,z) → (m,m). A
    // naive batch from the stale list would take [(a,z),(m,m)] in
    // round 1 — the strict-dominance truncation must prevent it.
    val docs = Seq.fill(50)("azz mm").toDF("text")
    val seqM = Bpe.learnMergesSequential(docs, "text", nMerges = 4)
    assert(seqM.merges.map(m => (m.left, m.right)) ==
      Seq(("a", "z"), ("az", "z"), ("m", "m")))
    val (batM, rounds) =
      Bpe.learnMergesWithRounds(docs, "text", nMerges = 4, maxBatch = 8)
    assert(batM.merges == seqM.merges)
    // round 2 batches [(az,z),(m,m)] together (strictly above the
    // empty remainder), so batching still saves a pass
    assert(rounds < 4)
  }

  test("batching cuts count passes ~maxBatch× on a wide corpus") {
    // many disjoint high-frequency pairs with strictly distinct
    // counts — the Zipfian shape batching exploits
    val words = (0 until 12).flatMap { i =>
      Seq.fill(100 - 5 * i)(s"${('a' + 2 * i).toChar}${('b' + 2 * i).toChar}")
    }
    val docs = Seq(words.mkString(" ")).toDF("text")
    val seqM = Bpe.learnMergesSequential(docs, "text", nMerges = 12)
    val (batM, rounds) =
      Bpe.learnMergesWithRounds(docs, "text", nMerges = 12, maxBatch = 8)
    assert(batM.merges == seqM.merges)
    assert(seqM.merges.length == 12)
    assert(rounds <= 3, s"expected <=3 count passes, took $rounds")
  }

  test("batched learnMerges equals the sequential reference on " +
      "random small-alphabet corpora (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    // tiny alphabet + repeated words maximizes ties, interacting
    // pairs, l==r chains, and same-string-different-split collisions
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val gen = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, wordGen))
    val prop = forAll(gen) { ws =>
      val freq = ws.groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
      val expected = refLearn(freq, 8)
      val got = Bpe.learnMerges(Seq(ws.mkString(" ")).toDF("text"),
        "text", nMerges = 8, minCount = 2L, maxBatch = 4)
      got.merges.map(m => (m.left, m.right, m.count)) == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("learnMerges stops when no pair reaches minCount") {
    val docs = Seq("ab cd ef").toDF("text") // every pair occurs once
    val got = Bpe.learnMerges(docs, "text", nMerges = 5, minCount = 2)
    assert(got.merges.isEmpty)
  }

  test("segment matches reference segmentation under learned merges") {
    val docs = Seq(
      "low low low low low",
      "lower lower newest newest",
      "newest newest newest newest",
      "widest widest widest"
    ).toDF("text")
    val model = Bpe.learnMerges(docs, "text", nMerges = 6)
    val got = docs.select(Bpe.segment(col("text"), model).as("s"))
      .as[Seq[String]].collect()
    val refSeg: String => Seq[String] = w =>
      model.merges.foldLeft(w.toVector.map(_.toString)) { (s, m) =>
        refApply(s, m.left, m.right) }
    val exp = docs.as[String].collect()
      .map(_.split("\\s+").toSeq.flatMap(refSeg))
    assert(got.toSeq.map(_.toList) == exp.toSeq.map(_.toList))
    // segmentation round-trips: concatenating subwords restores words
    val joined = got.flatten.mkString
    assert(joined == docs.as[String].collect()
      .flatMap(_.split("\\s+")).mkString)
  }

  test("subwordVocab counts match reference counts") {
    val docs = Seq("low low lowest", "lowest low").toDF("text")
    val model = BpeModel(Seq(BpeMerge(1, "l", "o", 5),
      BpeMerge(2, "lo", "w", 5)))
    val got = Bpe.subwordVocab(docs, "text", model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // low ×3 → [low]; lowest ×2 → [low, e, s, t]
    assert(got == Map("low" -> 5L, "e" -> 2L, "s" -> 2L, "t" -> 2L))
  }

  test("native segment equals the composed fold formulation " +
      "(property, incl. multi-byte code points)") {
    import org.scalacheck.Gen
    import org.scalacheck.Prop.forAll
    val model = BpeModel(Seq(BpeMerge(1, "a", "a", 9),
      BpeMerge(2, "aa", "a", 5), BpeMerge(3, "é", "日", 3),
      BpeMerge(4, "b", "c", 3)))
    val wordGen = Gen.listOf(Gen.oneOf("a", "b", "c", "é", "日", "𝄞"))
      .map(_.mkString)
    val gen = Gen.listOf(wordGen).map(_.mkString(" "))
    val prop = forAll(gen) { text =>
      val df = Seq(text).toDF("t")
      val native = df.select(Bpe.segment(col("t"), model))
        .as[Seq[String]].head()
      val composed = df.select(Bpe.segmentComposed(col("t"), model))
        .as[Seq[String]].head()
      native == composed
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("a null word yields a null subword stream (flatten semantics), " +
      "not an NPE") {
    import graft.text.Bpe.BpeModel
    val model = BpeModel(Seq(Bpe.BpeMerge(1, "a", "b", 2)))
    val df = spark.sql("SELECT array('ab', CAST(NULL AS STRING)) AS w")
      .select(graft.functions.BpeFunctions
        .bpe_segment_words($"w" , model.merges.map(m => (m.left, m.right)))
        .as("s"))
    assert(df.collect().head.isNullAt(0))
    // matches the composable flatten-over-null behavior
    val composed = spark.sql("SELECT array('ab', CAST(NULL AS STRING)) AS w")
      .select(flatten(transform($"w",
        x => Bpe.applyMerge(Bpe.chars(x), "a", "b"))).as("s"))
    assert(composed.collect().head.isNullAt(0))
  }

  test("empty and single-char words segment cleanly") {
    val model = BpeModel(Seq(BpeMerge(1, "a", "b", 2)))
    val got = Seq("a ab b", "").toDF("text")
      .select(Bpe.segment(col("text"), model).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a", "ab", "b"))
    assert(got(1) == Seq.empty)
  }
}
