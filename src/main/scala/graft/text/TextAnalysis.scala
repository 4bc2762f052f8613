package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting. Everything here is built from codegen'd built-in
  * functions (no UDFs), so the whole stage stays inside whole-stage
  * codegen and scales as a narrow map over the corpus — no shuffles.
  */
object TextAnalysis {

  /** Bind an expression ONCE as a lambda variable before a body that
    * references it repeatedly (the shingleOccurrences trick): Catalyst
    * performs no common-subexpression elimination inside or across
    * higher-order-function lambdas, so a composite metric referencing
    * `tokens(text)` four times re-splits — and re-evaluates however
    * expensive an expression `text` itself is (e.g. the redactPii
    * regex chain feeding qualityScore in the curation pipeline) —
    * four times per row. One-element transform + element_at evaluates
    * the argument exactly once and hands the body a cheap variable
    * reference. */
  private def bound(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Whitespace tokens of trimmed, lowercased text; empty text → empty
    * array (split of "" would otherwise yield [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of alphanumeric runs + count of
    * non-space punctuation marks, the usual cheap stand-in for a
    * tokenizer's token count when the real vocab isn't available at
    * scan time. RE2-compatible patterns (no lookaround) so the metric
    * reproduces in any engine. */
  def subwordCountApprox(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))) +
      size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))

  /** The tiny built-in English stopword list and the punctuation
    * character class — ONE definition each, shared by the per-metric
    * helpers AND the terms [[qualityScore]] inlines over its bound
    * variables (ADVICE r15: inlined copies would silently diverge
    * from the composite score if either were ever edited alone). */
  private val Stops = Seq("the", "a", "an", "and", "of", "to", "in", "is")
  private val PunctClass = "[.,!?;:]"

  /** Punctuation chars / total chars (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0)).otherwise(
      (len - length(regexp_replace(text, PunctClass, ""))).cast("double") /
        len.cast("double"))
  }

  /** Stopword tokens / total tokens (tiny built-in English list).
    * Token split bound once (three references otherwise re-split). */
  def stopwordRatio(text: Column): Column = bound(tokens(text)) { ts =>
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => t.isInCollection(Stops))).cast("double") /
        size(ts).cast("double"))
  }

  /** Mean token length in characters (0 for empty text). Token split
    * bound once (three references otherwise re-split). */
  def meanTokenLength(text: Column): Column = bound(tokens(text)) { ts =>
    when(size(ts) === 0, lit(0.0)).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite document quality score in [0,1] — the usual pretraining
    * heuristics: enough tokens, not punctuation-soup, some stopwords
    * (natural prose), sane word lengths. Deterministic IEEE arithmetic,
    * identical in any engine. */
  def qualityScore(text: Column): Column = bound(text) { t =>
    // `t` binds the (possibly expensive — see the curation pipeline,
    // where it is the redactPii regex chain) input expression once;
    // `ts` binds the token split once. The four terms below are the
    // same arithmetic as the public per-metric helpers, inlined over
    // the bound variables — previously each helper re-evaluated the
    // input and re-split per reference (~7 evaluations of `t`, 3
    // splits per row; measured 1.39 s → 0.6 s for the curation clean
    // stage at sf0.1). Values are bit-identical: identical IEEE ops
    // over identical inputs.
    bound(tokens(t)) { ts =>
      val nToks = size(ts)
      val lengthTerm = least(nToks.cast("double") / lit(100.0), lit(1.0))
      val len = length(t)
      val punct = when(len === 0, lit(0.0)).otherwise(
        (len - length(regexp_replace(t, PunctClass, ""))).cast("double") /
          len.cast("double"))
      val punctTerm = lit(1.0) - least(punct * lit(4.0), lit(1.0))
      val stopRatio = when(nToks === 0, lit(0.0)).otherwise(
        size(filter(ts, w => w.isInCollection(Stops))).cast("double") /
          nToks.cast("double"))
      val stopTerm = least(stopRatio * lit(4.0), lit(1.0))
      val meanLen = when(nToks === 0, lit(0.0)).otherwise(
        aggregate(ts, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          nToks.cast("double"))
      val wordLenTerm = when(
        meanLen.between(lit(2.0), lit(12.0)), lit(1.0))
        .otherwise(lit(0.0))
      (lengthTerm * lit(0.25)) + (punctTerm * lit(0.25)) +
        (stopTerm * lit(0.25)) + (wordLenTerm * lit(0.25))
    }
  }

  /** Fraction of word n-grams that repeat an earlier n-gram of the
    * same document — the standard within-document repetition signal
    * (template/boilerplate/keyword-stuffing detector) in pretraining
    * quality filters. 0.0 for documents too short to carry one
    * n-gram. Integer counts with a single double division at the end,
    * so the value is bit-stable across engines and partitionings. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = greatest(size(tokens(text)) - (n - 1), lit(0))
    val dist = size(graft.dedup.Dedup.shingles(text, n))
    when(total === 0, lit(0.0)).otherwise(
      lit(1.0) - dist.cast("double") / total.cast("double"))
  }

  /** Language ID by stopword voting — the classic cheap n-gram/stopword
    * heuristic. Deterministic argmax with fixed precedence
    * en > de > fr > es, 'und' (undetermined) when no marker hits. */
  def langId(text: Column): Column = bound(tokens(text)) { ts =>
    // ts binds the token split once — the four per-language counts
    // below each referenced tokens(text) and re-split the document
    // per language before
    def hits(words: Seq[String]): Column =
      size(filter(ts, t => t.isInCollection(words)))
    val en = hits(Seq("the", "and", "is", "of"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "les", "et", "est"))
    val es = hits(Seq("el", "los", "las", "y", "es"))
    val top = greatest(en, de, fr, es)
    when(top === 0, lit("und"))
      .when(en === top, lit("en"))
      .when(de === top, lit("de"))
      .when(fr === top, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Corpus vocabulary: one row per token with document frequency and
    * total term frequency. Two aggregations (per-doc distinct, then
    * corpus-wide) — the classic vocabulary-building job; at 100 TB the
    * only shuffle is on the token key with map-side partial counts. */
  def vocabulary(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    toks.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"))
  }

  /** TF-IDF scores: (doc_id, token, tf, df, tf_idf) with
    * idf = ln(N / df). Library form with real doubles; for oracle
    * comparisons use the integer-ranked salient-terms query (ln()
    * implementations differ across engines in the last ulp). */
  def tfIdf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val n = docs.count().toDouble
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, Seq("token"))
      .withColumn("tf_idf",
        col("tf").cast("double") * log(lit(n) / col("df").cast("double")))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tf_idf"))
  }

  /** Per-document bigram commonness: (doc_id, n_bigrams, commonness)
    * where commonness is the mean corpus frequency of the document's
    * bigram occurrences — the n-gram-LM quality axis (boilerplate
    * scores high, unusual text low). Exact integer counts with ONE
    * double division at the end, so the score is bit-identical at any
    * parallelism.
    *
    * Scale shape: two shuffles (count bigrams; join counts back). The
    * join is pinned to a SHUFFLED HASH join with the aggregated counts
    * table as the build side. Left to its own devices Catalyst picks
    * sort-merge here, and the sort of the fat occurrence side (~100
    * rows per document) was the single spill in the ×1..×100 scale
    * matrix (519 MB at ×100, SCALING.md). The hash build side is
    * bounded by distinct-bigrams/shuffle-partitions — vocabulary grows
    * sublinearly in corpus size (Heaps' law), so per-partition build
    * memory stays flat while the occurrence side streams unsorted.
    * Partition count is the cluster-scale knob. */
  def bigramCommonness(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(t)-2), " +
        "i -> concat(element_at(t, i+1), ' ', element_at(t, i+2)))"))
        .as("bigram"))
    val counts = bi.groupBy(col("bigram")).agg(count(lit(1)).as("c"))
    bi.join(counts.hint("shuffle_hash"), Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double"))
          .as("commonness"))
  }

  /** Mean bigram conditional probability of each document under the
    * corpus's own bigram language model: score = mean over the doc's
    * bigrams of p(w2|w1) = c(w1,w2) / c(w1,·). The statistical
    * quality signal `bigramCommonness` approximates from raw
    * frequency — a low score means improbable word SEQUENCES
    * (gibberish, shuffled text, OCR noise) even when every individual
    * token is common. Deterministic across engines: each p is one
    * correctly-rounded double division of two exact counts, and the
    * mean quantizes each p to DECIMAL(18,9) before the
    * order-independent exact sum.
    *
    * Scale shape: one shuffle to count bigrams, the prefix table
    * derives from the ALREADY-AGGREGATED bigram counts (no second
    * corpus scan), then two shuffled-hash joins keyed on grams —
    * hinted, because sorting the fat occurrence side was the one
    * spill the scale matrix ever produced (see bigramCommonness). */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(col("doc_id"),
      explode(expr("transform(sequence(0, size(t)-2), " +
        "i -> struct(element_at(t, i+1) AS w1, element_at(t, i+2) AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c")).as("cp"))
    bi.join(c12.hint("shuffle_hash"), Seq("w1", "w2"))
      .join(c1.hint("shuffle_hash"), Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum((col("c").cast("double") / col("cp").cast("double"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 9)))
          .cast("double") / count(lit(1)).cast("double"))
          .as("lm_score"))
  }

  /** Per-document most-frequent word n-gram (the remaining Gopher
    * §A1.1 repetition rule: "fraction of characters in the most
    * frequent n-gram"): returns (doc_id, top_ngram, top_count,
    * top_char_frac) where top_char_frac = top_count · |top_ngram| /
    * |trim(text)| — the standard occurrence-count approximation of
    * covered characters (overlaps uncounted). Ties break to the
    * lexicographically greatest n-gram, so the winner is a pure
    * function of the document in any engine (Spark's struct max and
    * `ORDER BY cnt DESC, gram DESC` agree on ASCII). Documents with
    * fewer than n tokens are dropped. Narrow per-row map,
    * O(distinctGrams × grams) with natural-text bounds. */
  def topNgramStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 2): org.apache.spark.sql.DataFrame = {
    // the one gram/tokenization contract, shared with the dedup and
    // coverage paths (shingles == array_distinct of these windows)
    val grams = graft.dedup.Dedup.shingleOccurrences(col(textCol), n)
    // sort + run-length fold: O(g log g) per document. The obvious
    // count-per-distinct form (filter-count inside a transform over
    // array_distinct) is O(distinct × g) — quadratic on real
    // multi-thousand-token documents where most grams are unique,
    // which is exactly the corpus this filter exists for. Equal grams
    // are adjacent after the sort, so one pass tracks the current run
    // and the best-so-far; `>=` on the update means the LAST gram to
    // reach the max run wins — the lexicographically greatest, the
    // documented tie-break.
    val zero = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("bestC"), lit(null).cast("string").as("bestG"))
    val folded = aggregate(array_sort(col("grams")), zero, (st, g) => {
      val run = when(st.getField("prev") === g,
        st.getField("run") + 1L).otherwise(lit(1L))
      struct(g.as("prev"), run.as("run"),
        when(run >= st.getField("bestC"), run)
          .otherwise(st.getField("bestC")).as("bestC"),
        when(run >= st.getField("bestC"), g)
          .otherwise(st.getField("bestG")).as("bestG"))
    })
    docs
      .filter(size(grams) > 0)
      .select(col(idCol).as("doc_id"),
        length(trim(col(textCol))).cast("long").as("text_len"),
        grams.as("grams"))
      .withColumn("best", folded)
      .select(
        col("doc_id"),
        col("best.bestG").as("top_ngram"),
        col("best.bestC").as("top_count"),
        ((col("best.bestC") * length(col("best.bestG"))).cast("double") /
          col("text_len").cast("double")).as("top_char_frac"))
  }

  /** Per-document n-gram coverage against a reference corpus: the
    * fraction of the document's DISTINCT word n-grams that occur
    * anywhere in `reference` — the soft contamination/novelty score
    * complementing the hard overlap flag of
    * [[graft.dedup.Dedup.decontaminate]] (a doc can pass a ≥k-span
    * decontamination gate yet still be 90% assembled from reference
    * phrases; this measures that). Exact integer counts, one division.
    *
    * Scale shape: the reference's distinct-gram build map-side
    * combines on the gram key; the probe is a shuffled-hash equi-join
    * on grams (hinted — the gram tables are fat and sorting them is
    * the only spill risk), then one per-doc count aggregation. At
    * 100 TB both sides shuffle once, keyed on grams; nothing is
    * collected. */
  def ngramCoverage(docs: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    val sh = graft.dedup.Dedup.shingles(col(textCol), n)
    val docGrams = docs.select(col(idCol).as("doc_id"),
        explode(sh).as("g"))
    val refGrams = reference.select(explode(sh).as("g")).distinct()
      .withColumn("hit", lit(true))
    docGrams.join(refGrams.hint("shuffle_hash"), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("covered_grams"))
      .withColumn("coverage",
        col("covered_grams").cast("double") /
          col("n_grams").cast("double"))
  }

  /** PII redaction: mask emails and phone-number-shaped digit runs —
    * the standard scrub before text enters a training corpus. Pure
    * regexp_replace chain (codegen'd, narrow); patterns deliberately
    * conservative (over-masking beats leaking). */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail,
      "\\+?\\d[\\d() -]{7,}\\d", "<PHONE>")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercase text —
    * byte-stable across engines, the key for exact near-duplicate
    * grouping after normalization. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** 64-bit rolling fingerprint: min of xxhash64 over word 3-shingles
    * (a 1-element MinHash) — cheap doc sketch for clustering/bucketing
    * at scale. Fastest variant (codegen'd xxhash64) but not portable
    * SQL; see [[polyFingerprint]] for the cross-engine-checkable
    * form. */
  def rollingFingerprint(text: Column, shingleSize: Int = 3): Column = {
    val sh = graft.dedup.Dedup.shingles(text, shingleSize)
    when(size(sh) === 0, xxhash64(lit("")))
      .otherwise(array_min(transform(sh, s => xxhash64(s))))
  }

  /** Portable rolling fingerprint: min over word 3-shingles of the
    * classic base-31 polynomial rolling hash mod 1e9+7, computed per
    * character (`h = (h*31 + codepoint) mod p`). Same sketch semantics
    * as [[rollingFingerprint]] but exactly reproducible in any engine
    * with integer arithmetic — the hash-checkable flavor. -1 marks
    * docs too short to shingle. */
  def polyFingerprint(text: Column, shingleSize: Int = 3): Column = {
    val sh = graft.dedup.Dedup.shingles(text, shingleSize)
    val polyHash = (s: Column) => aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)
    when(size(sh) === 0, lit(-1L))
      .otherwise(array_min(transform(sh, polyHash)))
  }
}
