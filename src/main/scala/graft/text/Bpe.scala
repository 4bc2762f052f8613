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

  /** The weighted distinct-word table (word, w) — the corpus-size-
    * independent training representation a production pipeline
    * persists between runs. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("w"))

  /** Adjacent-pair counts over the current symbol table, sorted by the
    * BPE argmax order (count DESC, left ASC, right ASC), top `n`. */
  private def topPairs(cur: DataFrame, n: Int): Array[(String, String,
      Long)] =
    // words collapsed to one symbol have no pairs — and would turn
    // sequence(1, 0) into a DESCENDING range hitting index 0
    cur.filter(size(col("syms")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("syms")) - 1),
        j => struct(element_at(col("syms"), j).as("l"),
          element_at(col("syms"), j + 1).as("r")))).as("p"),
        col("w"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("w")).as("cnt"))
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(n).collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2)))

  /** Learn up to `nMerges` merges from the corpus. Stops early when no
    * adjacent pair occurs at least `minCount` times. Deterministic at
    * any parallelism: the argmax tie-break is (count DESC, left ASC,
    * right ASC) and pair counts are exact integers.
    *
    * Runs [[learnMergesWithRounds]] with batching on: up to `maxBatch`
    * merges are learned per count pass, with the batch chosen so the
    * result is BIT-IDENTICAL to the one-merge-per-pass fold
    * ([[learnMergesSequential]], which BpeSpec property-pins against
    * this). At a 32k-merge production vocabulary this cuts the number
    * of Spark jobs from 32k sequential shuffles to ~32k/maxBatch —
    * the difference between a training run and a scheduler stall at
    * 100 TB. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxBatch: Int = 32): BpeModel =
    learnMergesWithRounds(docs, textCol, nMerges, minCount, maxBatch)._1

  /** One merge per count pass — the executable spec [[learnMerges]]'s
    * batched selection is property-tested against. */
  def learnMergesSequential(docs: DataFrame, textCol: String,
      nMerges: Int, minCount: Long = 2L): BpeModel =
    learnMergesWithRounds(docs, textCol, nMerges, minCount, 1)._1

  /** [[learnMerges]] plus the number of count passes (Spark job
    * rounds) it took — the scale metric batching improves.
    *
    * Batched selection, exact-equivalence argument. One count pass
    * yields the stale sorted candidate list c1, c2, … (count DESC,
    * left ASC, right ASC). The batch is a PREFIX c1..ck of that list
    * such that, by induction, c_i is precisely the argmax the
    * sequential fold would compute after applying c1..c_{i-1}. The
    * key fact: applying merge (a,b) changes the count (and merge
    * positions) of an existing pair (x,y) ONLY when y == a (the pair
    * runs INTO a consumed `a`) or x == b (it runs OUT of a consumed
    * `b`) — a pair that merely shares a symbol elsewhere, like (o,r)
    * under (e,r), is bit-for-bit invariant: the `r` in an `o,r`
    * adjacency is never preceded by `e`, and merges never delete
    * symbols, so no adjacency appears or disappears. Hence:
    *
    *  - A candidate (x,y) joins the batch only if for every earlier
    *    member (a,b): y != a and x != b — its count and positions are
    *    then exactly what the sequential fold would see. Members MAY
    *    share symbols in the other positions ((e,r) then (o,r)
    *    batches), which is what makes batches deep on natural text.
    *  - Pairs a member (a,b) CREATES involve its minted symbol and
    *    are bounded by the stale count of some pair shaped (·,a) or
    *    (b,·) (each (x,ab) occurrence was a stale x,a,b; recursively,
    *    created-of-created pairs bottom out in the same shapes). The
    *    scan ACCUMULATES that bound — the max stale count over
    *    collected (·,a)/(b,·) pairs plus the last-collected count as
    *    the ceiling for uncollected ones — and admits a later member
    *    only with count STRICTLY above it, so nothing minted can tie
    *    a member and win the lexicographic tie-break. A left==right
    *    member bounds itself ((a,a) is its own (·,a) pair), closing
    *    the batch behind it — "aaaa" → [aa,aa] mints (aa,aa) pairs
    *    bounded only by the member's own count.
    *  - The scan STOPS at the first candidate that fails either test
    *    (never skips): any pair preceding an admitted member in stale
    *    order is either a member or the stopper, so nothing unknown
    *    can outrank a member at its selection step.
    *  - A member whose minted string already exists as a corpus
    *    symbol closes the batch after itself (pre-existing pairs over
    *    that symbol could GAIN occurrences, breaking the
    *    decrease-only argument for later members). The existing-
    *    symbol test uses a driver-side superset vocabulary (initial
    *    distinct symbols ∪ every string minted so far) — conservative,
    *    so always safe, and costing zero extra jobs per round. */
  def learnMergesWithRounds(docs: DataFrame, textCol: String,
      nMerges: Int, minCount: Long = 2L, maxBatch: Int = 32)
      : (BpeModel, Int) =
    learnMergesFromWordCounts(wordTable(docs, textCol), nMerges,
      minCount, maxBatch)

  /** Train directly from a weighted distinct-word table (`word`
    * string, `w` long) — the entry a production pipeline uses when
    * word counts are already materialized (they usually are: token
    * accounting builds the same table). Same batched selection and
    * guarantees as [[learnMergesWithRounds]]. */
  def learnMergesFromWordCounts(words: DataFrame, nMerges: Int,
      minCount: Long = 2L, maxBatch: Int = 32): (BpeModel, Int) = {
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    var cur = words
      .select(chars(col("word")).as("syms"), col("w").cast("long").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = Vector.newBuilder[BpeMerge]
    var rounds = 0
    // lineage truncation: each round's plan nests the previous round's
    // (persist caches DATA, not the logical plan), so a large-vocab
    // run grows an O(rounds)-deep tree whose per-action plan STRING
    // alone OOMs the driver around a few hundred rounds (the standard
    // iterative-algorithm failure; GraphX/ALS checkpoint for the same
    // reason). Every few rounds the frame is locally checkpointed —
    // the plan restarts from a LogicalRDD and driver cost stays O(1)
    // per round.
    var sinceTrunc = 0
    val truncEvery = 8
    try {
      // conservative symbol-vocabulary superset (see scaladoc): one
      // small job up front, then maintained on the driver
      val vocab = scala.collection.mutable.HashSet.empty[String]
      if (maxBatch > 1)
        vocab ++= cur.select(explode(col("syms")).as("s")).distinct()
          .collect().map(_.getString(0))
      var rank = 1
      var done = false
      // ADAPTIVE candidate depth: deeper lists lower the ceiling
      // assumed for UNCOLLECTED pairs in the created-pair hazard
      // bound, letting exact batches go deeper — but a fixed deep
      // collect makes every pass pay a deep TakeOrdered heap + driver
      // merge even when the hazard stops batches after 1-2 members
      // (saturating corpora: measured 31.5 s batched vs 22.1 s
      // sequential at 89 merges with a fixed 256). Track how much of
      // the list each scan actually CONSUMES (EMA), collect 2× that;
      // a scan that ran out of list without a stop signal doubles the
      // estimate instead — the list, not the hazard, was binding.
      // Exactness is depth-independent (the hazard ceiling adapts to
      // whatever was collected; BpeSpec property-pins == sequential).
      // NO budget-sized floor: on saturating corpora the hazard stops
      // batches after 1-2 members and a maxBatch-deep collect every
      // pass is pure overhead (measured 20.1 vs 17.5 s sequential with
      // a budget+1 floor at 89 merges) — when the hazard WOULD allow
      // deeper batches the scan drains its list, trips listBound, and
      // the estimate doubles within a few rounds.
      var depthEst = 16.0
      while (rank <= nMerges && !done) {
        val budget = math.min(maxBatch, nMerges - rank + 1)
        val collectN =
          math.max(2, math.min(256, (2 * depthEst).ceil.toInt))
        val top = topPairs(cur, collectN)
        rounds += 1
        val cands = top.filter(_._3 >= minCount)
        if (cands.isEmpty) done = true
        else {
          // greedy exact-prefix selection (see scaladoc)
          val memberA = scala.collection.mutable.ArrayBuffer.empty[String]
          val memberB = scala.collection.mutable.ArrayBuffer.empty[String]
          val batch = scala.collection.mutable
            .ArrayBuffer.empty[(String, String, Long)]
          // ceiling for pairs below the collected window (none if the
          // whole table fit)
          val uncollected =
            if (top.length >= collectN) top.last._3 else minCount - 1
          var hazard = 0L
          var stop = false
          // stopped by the TRUNCATION CEILING (hazard == uncollected,
          // no observed stale pair above it): a deeper list would have
          // lowered the ceiling — that is a list-bound stop, not a
          // corpus-structure stop, and must grow the collect depth
          var ceilingStop = false
          var i = 0
          while (i < cands.length && !stop && batch.length < budget) {
            val (x, y, c) = cands(i)
            if (memberA.contains(y) || memberB.contains(x)) stop = true
            else if (batch.nonEmpty && c <= hazard) {
              stop = true
              ceilingStop = hazard == uncollected && top.length >= collectN
            } else {
              batch += cands(i)
              memberA += x; memberB += y
              // created-pair bounds for THIS member: stale (·,x) and
              // (y,·) counts — (x,x)/(y,y) self-pairs included, which
              // is what closes the batch behind a left==right member
              var h = uncollected
              top.foreach { case (qx, qy, qc) =>
                if (qy == x || qx == y) h = math.max(h, qc) }
              hazard = math.max(hazard, h)
              if (vocab(x + y)) stop = true
            }
            i += 1
          }
          // exhaustion counts as list-bound only when the collected
          // list was truly drained (cands.length == top.length): if
          // the minCount filter truncated cands, everything below the
          // collected window is ALSO below minCount (top is sorted by
          // count), so a deeper collect cannot yield more eligible
          // candidates and doubling depth would chase nothing
          val listBound = ceilingStop || (!stop && i >= cands.length &&
            batch.length < budget && top.length >= collectN &&
            cands.length == top.length)
          depthEst = 0.7 * depthEst +
            0.3 * (if (listBound) collectN * 2.0 else (i + 1).toDouble)
          val kept = batch
          kept.foreach { case (l, r, c) =>
            merges += BpeMerge(rank, l, r, c)
            vocab += (l + r)
            rank += 1
          }
          // native merge passes chained in ONE job (same greedy
          // semantics as the composable applyMerge fold, which BpeSpec
          // pins) — the fold copies the accumulator per character,
          // this is one buffer pass per word per merge
          val applied = kept.foldLeft(col("syms")) { case (c, (l, r, _)) =>
            graft.functions.BpeFunctions.bpe_apply_merge(c, l, r) }
          val next = cur.select(applied.as("syms"), col("w"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          // materialize the fold ONCE per round, then drop the parent
          // cache — without this each round re-evaluates every prior
          // fold, turning k merges into O(k²) work
          next.count()
          cur.unpersist(false)
          cur = next
          sinceTrunc += 1
          if (sinceTrunc >= truncEvery) {
            val t = cur.localCheckpoint(true)
            cur.unpersist(false)
            cur = t
            sinceTrunc = 0
          }
        }
      }
      (BpeModel(merges.result()), rounds)
    } finally cur.unpersist(false)
  }
}
