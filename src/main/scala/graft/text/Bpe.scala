package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding — the tokenizer-training /
  * tokenizer-application pair a training-data pipeline runs over its
  * corpus (vocabulary induction, token-budget accounting, packing
  * inputs).
  *
  * Training (Sennrich-style word-level BPE): operate on the DISTINCT
  * word table weighted by word frequency — the corpus-size-independent
  * representation (Heaps' law: distinct words grow sublinearly in
  * corpus size, so a 100 TB corpus trains over a table of merely
  * millions of rows). Each merge round is one adjacent-pair count
  * (a groupBy on the pair key with map-side partial sums) plus a
  * 1-row argmax to the driver; the merge itself applies as a pure
  * array fold — no UDF, no driver-side word data, ever.
  *
  * Application ([[segment]]) is a per-row expression: split a word to
  * characters, then fold each learned merge over the symbol array in
  * rank order, greedily left-to-right (the standard BPE semantics:
  * "aaaa" under merge (a,a) → [aa, aa]; "aaa" → [aa, a]).
  */
object Bpe {

  final case class BpeMerge(rank: Int, left: String, right: String,
      count: Long)

  final case class BpeModel(merges: Seq[BpeMerge])

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (left, right) becomes left+right, non-overlapping. A pure
    * built-in-function fold — stays a JVM expression, no UDF. */
  def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(left) && x === lit(right),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** A word (no whitespace) split into single characters. */
  def chars(word: Column): Column = split(word, "")

  /** Segment one word through the model's merges in rank order —
    * the composable fold formulation. Correct but allocation-bound
    * (`concat(acc, array(x))` copies the accumulator per character:
    * O(len²) per merge); [[segment]] uses the native expression
    * instead. Kept as the executable spec the native path is
    * property-tested against. */
  def segmentWordComposed(word: Column, model: BpeModel): Column =
    model.merges.foldLeft(chars(word)) { (syms, m) =>
      applyMerge(syms, m.left, m.right)
    }

  /** [[segment]]'s fold formulation (spec twin). */
  def segmentComposed(text: Column, model: BpeModel): Column =
    flatten(transform(TextAnalysis.tokens(text),
      w => segmentWordComposed(w, model)))

  /** Segment whole text: whitespace words, each BPE-segmented;
    * flattened subword stream (word boundaries do not merge). One
    * native expression ([[graft.functions.BpeSegmentWords]]): an
    * in-place buffer pass per merge inside whole-stage codegen —
    * measured orders of magnitude over the interpreted fold at
    * corpus scale (SCALING.md). */
  def segment(text: Column, model: BpeModel): Column =
    graft.functions.BpeFunctions.bpe_segment_words(
      TextAnalysis.tokens(text),
      model.merges.map(m => (m.left, m.right)))

  /** Corpus subword vocabulary under a model: (subword, count). One
    * narrow segmentation map + one count shuffle on the subword key. */
  def subwordVocab(docs: DataFrame, textCol: String,
      model: BpeModel): DataFrame =
    docs.select(explode(segment(col(textCol), model)).as("subword"))
      .groupBy("subword").agg(count(lit(1)).as("cnt"))

  /** Learn up to `nMerges` merges from the corpus. Stops early when no
    * adjacent pair occurs at least `minCount` times. Deterministic at
    * any parallelism: the argmax tie-break is (count DESC, left ASC,
    * right ASC) and pair counts are exact integers. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): BpeModel = {
    val spark = docs.sparkSession
    val words0 = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("w"))
      .select(chars(col("word")).as("syms"), col("w"))
    var cur = words0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[BpeMerge]
    try {
      var rank = 1
      var done = false
      while (rank <= nMerges && !done) {
        // words collapsed to one symbol have no pairs — and would turn
        // sequence(1, 0) into a DESCENDING range hitting index 0
        val best = cur.filter(size(col("syms")) >= 2)
          .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
            j => struct(element_at(col("syms"), j).as("l"),
              element_at(col("syms"), j + 1).as("r")))).as("p"),
            col("w"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("w")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (best.isEmpty || best.head.getLong(2) < minCount) done = true
        else {
          val (l, r, c) =
            (best.head.getString(0), best.head.getString(1),
              best.head.getLong(2))
          merges += BpeMerge(rank, l, r, c)
          // native single-merge pass (same greedy semantics as the
          // composable applyMerge fold, which BpeSpec pins) — the fold
          // copies the accumulator per character, this is one buffer
          // pass per word
          val next = cur
            .select(graft.functions.BpeFunctions
              .bpe_apply_merge(col("syms"), l, r).as("syms"), col("w"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // materialize the fold ONCE per round, then drop the parent
          // cache — without this each round re-evaluates every prior
          // fold, turning k merges into O(k²) work
          next.count()
          cur.unpersist(false)
          cur = next
          rank += 1
        }
      }
      BpeModel(merges.result())
    } finally cur.unpersist(false)
  }
}
