package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — the
  * deterministic counterpart to MinHash dedup: every returned pair has
  * its TRUE Jaccard (or containment) attached and the result is
  * provably complete above the threshold, with no probabilistic recall
  * gap, while still never comparing all pairs.
  *
  * Candidates come from the prefix-filtering principle of the
  * AllPairs/PPJoin family (Bayardo/Ma/Srikant WWW'07, Xiao/Wang/Lin/Yu
  * WWW'08, public literature): order every document's distinct tokens
  * by a single global canon — ascending document frequency, ties by
  * token text — and keep only each document's first
  * `|x| - ceil(t*|x|) + 1` tokens (its "prefix", the rarest ones). If
  * `J(x,y) >= t` then `|x ∩ y| >= ceil(t*max(|x|,|y|))` (the union is
  * at least the larger set), and a counting argument over the shared
  * canon shows the two prefixes must share at least one token — so an
  * equi-join of prefixes on the token catches every qualifying pair.
  * Rarest-first ordering is what makes the filter selective: prefixes
  * meet on low-frequency tokens, so stopword-sized buckets never form
  * a quadratic hot spot.
  *
  * Scale shape: the document-frequency table is vocabulary-sized (one
  * shuffle to build, then an equi-join to attach — AQE broadcasts it
  * when small); the candidate shuffle carries only `(id, len, token)`
  * scalars; token ARRAYS are fetched by id-join for surviving
  * candidate pairs only, and verification (`array_intersect` /
  * `array_union` sizes) runs as a join residual. Length filtering
  * (`t*|x| <= |y| <= |x|/t` for Jaccard) prunes candidates inside the
  * join condition before the residual runs.
  *
  * Containment `C(x,y) = |x ∩ y| / |x| >= t` (is x mostly inside y? —
  * the boilerplate/quotation detector) is the asymmetric variant: the
  * probe side keeps its prefix, but the index side must post ALL its
  * tokens (a huge y can absorb a tiny x, so y gets no prefix and no
  * length upper bound).
  *
  * THRESHOLD BOUNDARY — when to use MinHash instead: prefix length is
  * `(1-t)·|x| + 1`, so candidate volume is governed by the threshold
  * twice over. As t drops, (a) prefixes LENGTHEN — at t=0.9 a
  * 100-token doc posts 11 tokens, at t=0.5 it posts 51 — and (b)
  * commoner tokens ENTER prefixes (the rarest-first canon only
  * protects the first few slots), so bucket sizes climb toward raw
  * document frequencies and candidate pairs toward
  * share-any-token all-pairs. In practice the exact join is the right
  * tool at t ≳ 0.8 on word tokens; below that, MinHash LSH (bands
  * tuned to the threshold) + exact verification of its candidates is
  * strictly cheaper — it probes O(bands) fixed-size keys per doc
  * regardless of t. Orthogonally, a BOILERPLATE FAMILY of F
  * near-identical docs costs O(F²) candidate pairs at ANY threshold:
  * their prefixes meet on the family's shared rarest word, and
  * exactness REQUIRES those pairs (each could be a true match — no
  * skew cap is sound for an exact operator, unlike MinHash's). Run
  * [[prefixBucketStats]] as the pre-flight: if the top bucket is
  * family-sized, dedup first (exact/chunk dedup dissolves the family
  * for a linear price) or accept MinHash's probabilistic recall.
  *
  * Reference analog: the reference deduplicates ingested song/user
  * batches by exact key only (api_sessions-dedup in
  * transform-json-job.py); this is the content-level form its corpus
  * curation would need at lake scale.
  */
object SetJoin {

  /** Distinct word-token set of `text`, in canonical (sorted) array
    * form — [[graft.text.TextAnalysis.tokens]] tokenization so every
    * text operator in the engine agrees on what a token is. */
  private def tokenSet(text: Column): Column =
    array_sort(array_distinct(graft.text.TextAnalysis.tokens(text)))

  /** `(id, len, toks, pref)` — documents with their distinct-token
    * arrays ordered rarest-first and the length-`prefLen(len)` prefix
    * sliced off, plus the document-frequency table the canon was cut
    * against (persisted — [[smallVocab]]'s probe reads it instead of
    * re-aggregating the postings). `prefLen` decides Jaccard vs
    * containment. */
  private case class Prefixed(pref: DataFrame, docFreq: DataFrame)
  private def prefixed(df: DataFrame, idCol: String, textCol: String,
      prefLen: Column => Column): Prefixed = {
    // (kept one-site: jaccardJoin, containmentJoin and
    // prefixBucketStats must all cut prefixes against the SAME canon)
    val base = df
      .select(col(idCol).as("id"), tokenSet(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    // vocabulary-sized document-frequency table; the canon every
    // prefix is cut against must be GLOBAL, so this aggregation is
    // semantically required — one shuffle, then an equi-join back.
    // Persisted LAZILY: pref's eager materialization below computes
    // it exactly once, and the small-vocab probe then reads the
    // cached vocabulary-sized rows instead of paying a second full
    // postings pass (round-16; the probe used to re-explode and
    // re-aggregate every document's token array per join call).
    val docFreq = graft.dedup.Dedup.persistLazy(
      base.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df")))
    val ranked = base
      .select(col("id"), size(col("toks")).as("len"),
        explode(col("toks")).as("tok"))
      .join(docFreq, "tok")
      .groupBy("id", "len")
      .agg(array_sort(collect_list(struct(col("df"), col("tok"))))
        .as("ordered"))
      .select(col("id"), col("len"),
        transform(col("ordered"), s => s.getField("tok")).as("toks"))
    // consumed three times (probe side a, probe side b, verification
    // sets): one materialization, or the tokenize → doc-frequency
    // shuffle → re-aggregate chain recomputes per consumer
    Prefixed(graft.dedup.Dedup.persistEager(
      ranked.select(col("id"), col("len"), col("toks"),
        slice(col("toks"), lit(1), greatest(prefLen(col("len")), lit(1)))
          .as("pref"))), docFreq)
  }

  /** Small-vocabulary fast path: when the corpus's DISTINCT token
    * vocabulary fits in 63 bits (a runtime property, detected with
    * one bounded driver pull off the already-computed document-
    * frequency table — vocabulary-sized, persisted by [[prefixed]],
    * capped at 64 rows like EditJoin's 65-length probe; 63 rather
    * than 64 keeps every mask non-negative and the representation
    * replayable in engines whose signed left-shift rejects bit 63 —
    * DuckDB, where the oracle's own mask replay guards exactly this
    * boundary), every document's
    * token SET is one 64-bit mask (bit = global canon rank of the
    * token), and set algebra collapses to integer ops:
    * `|x ∩ y| = bit_count(maskX & maskY)`. Candidates still come from
    * the same prefix postings (NEVER all pairs — corpus size is
    * unbounded even when the vocabulary is tiny), but verification
    * runs as a JOIN RESIDUAL on the posting masks and pair dedup as a
    * first-match bit test — `(prefMaskA & maskB & (2^rank − 1)) == 0`
    * keeps exactly the lowest-canon shared posting, sound because a
    * doc's canon-sorted array makes "tokens before position p" ==
    * "tokens with smaller canon rank" — so the whole join is ONE
    * equi-join with scalar residuals: no pair distinct, no group-by,
    * no array-fetch verify join. This is precisely the regime where
    * the general path hurts most: with ~30 tokens shared by everyone,
    * "rarest-first" prefixes stop being selective and candidate
    * volume approaches the (output-bound) answer itself — measured
    * sf0.1: 2.24M true pairs from 10.9M candidates; paying an
    * array_intersect per candidate is the dominant cost the mask
    * residual removes. Returns None when the vocabulary exceeds 63
    * and the caller falls through to the general array path. */
  private case class VocabMasks(rank: Column => Column, nTokens: Int)
  private def smallVocab(p: Prefixed): Option[VocabMasks] = {
    // per-document token arrays are distinct sets, so docFreq's count
    // is exactly the df the old postings re-aggregation computed; the
    // (df ASC, tok ASC) order is the canon prefixed() ranked by
    val vocab = p.docFreq
      .orderBy(col("df").asc, col("tok").asc)
      .limit(64).collect()
    if (vocab.length > 63 || vocab.isEmpty) None
    else {
      // canon rank = position in (df ASC, tok ASC) order — the SAME
      // order prefixed() sorts token arrays by, so bit index i <->
      // canon position consistency holds per document.
      val pairs = vocab.zipWithIndex.flatMap { case (r, i) =>
        Seq(lit(r.getString(0)), lit(i)) }
      val rankMap = map(pairs.toIndexedSeq: _*)
      Some(VocabMasks(tok => element_at(rankMap, tok), vocab.length))
    }
  }

  /** Bitmask of an array of tokens under `rank`. */
  private def maskOf(arr: Column, rank: Column => Column): Column =
    aggregate(arr, lit(0L),
      (acc, tk) => acc.bitwiseOR(call_function("shiftleft", lit(1L), rank(tk))))

  /** 1-based canon position of every common-token occurrence an
    * equi-join can meet on: for a common token at position `posA` in
    * x's canon-ordered array and `posB` in y's, every OTHER common
    * token is canon-less (≤ min(posA−1, posB−1) of them fit before)
    * or canon-greater (≤ min(lenA−posA, lenB−posB) fit after), so
    *   |x ∩ y| ≤ min(posA−1, posB−1) + 1 + min(lenA−posA, lenB−posB)
    * — the PPJoin positional filter (Xiao/Wang/Lin/Yu WWW'08, public
    * literature). The bound holds at EVERY common occurrence, so a
    * pair whose true overlap qualifies passes it at every meeting —
    * putting it in the join condition is lossless and kills
    * candidates whose shared token sits too late in either array to
    * leave room for the required overlap. (It also implies the
    * classic length filters: the bound never exceeds min(lenA,
    * lenB).) */
  private def posBound(a: String, b: String): Column =
    least(col(s"$a.pos") - 1, col(s"$b.pos") - 1) + lit(1) +
      least(col(s"$a.len") - col(s"$a.pos"),
        col(s"$b.len") - col(s"$b.pos"))

  /** All unordered pairs `(idA < idB, jaccard)` with word-token
    * Jaccard `>= threshold`, exactly. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccardJoin threshold must be in (0, 1], got $threshold")
    val t = lit(threshold)
    val p = prefixed(df, idCol, textCol,
      len => (len - ceil(t * len) + 1).cast("int"))
    smallVocab(p) match {
      case Some(vm) => jaccardMasked(p.pref, vm, t)
      case None => jaccardGeneral(p.pref, t)
    }
  }

  private def jaccardGeneral(pref: DataFrame, t: Column): DataFrame = {
    val probe = pref.select(col("id"), col("len"),
        posexplode(col("pref")))
      .toDF("id", "len", "p0", "tok")
      .select(col("id"), col("len"), (col("p0") + 1).as("pos"),
        col("tok"))
    // candidate pairs: shared prefix token + Jaccard length filter +
    // positional filter — only (id, len, pos, tok) scalars cross this
    // shuffle. J(x,y) ≥ t ⟺ overlap ≥ t/(1+t)·(lenA+lenB); with the
    // positional bound B as the best-case overlap the keep condition
    // is written as the SAME IEEE division the verification computes
    // (B/(lenA+lenB−B) ≥ t) — division is monotonic, so a pair whose
    // verified jaccard passes always has its bound-division pass too:
    // no float-boundary disagreement between filter and verify is
    // possible. Cheap integer length filters run first (And
    // short-circuits before the division).
    val bound = posBound("a", "b")
    val cand = probe.as("a").join(probe.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id") &&
          col("b.len") >= ceil(t * col("a.len")) &&
          col("b.len") <= floor(col("a.len") / t) &&
          col("a.len") >= ceil(t * col("b.len")) &&
          col("a.len") <= floor(col("b.len") / t) &&
          bound.cast("double") /
            (col("a.len") + col("b.len") - bound).cast("double") >= t)
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
      .distinct()
    verifyJaccard(cand, pref, t)
  }

  /** All ordered pairs `(idA != idB, containment)` where at least
    * `threshold` of A's tokens appear in B, exactly.
    *
    * The index side still posts ALL its tokens (a huge container can
    * absorb a tiny probe, so no length upper bound and no index
    * prefix exist — the class doc's documented asymmetry), but three
    * PPJoin+-style prunes keep the candidate stream far below the
    * raw prefix×index bucket products:
    *  1. the [[posBound]] positional filter in the join condition —
    *     at t=1.0 it reduces to `posB ≤ lenB − lenA + 1` (A's rarest
    *     token must sit early enough in B's canon order to leave room
    *     for ALL of A's remaining tokens after it), which kills most
    *     meetings before they become candidate rows; it also implies
    *     the `lenB ≥ t·lenA` length filter;
    *  2. a group-level suffix filter replacing the old pair
    *     `distinct()`: because B posts all tokens, the per-pair match
    *     count m IS |pref(A) ∩ B| exactly, and every remaining common
    *     token lives in A's suffix (canon-greater than all of A's
    *     prefix, hence than the token at B's deepest match maxPosB),
    *     so overlap ≤ m + min(lenA−prefLenA, lenB−maxPosB) — pairs
    *     whose best case can't reach t·lenA never touch the verify
    *     join (same shuffle as the distinct, strictly fewer
    *     survivors);
    *  3. verification intersects only A's SUFFIX with B (the prefix
    *     part of the overlap is already exact in m), reusing the
    *     group keys instead of re-deriving them.
    * Filters 1–2 undercount m only for pairs below the threshold
    * (a qualifying pair passes the positional bound at every
    * meeting), so surviving non-qualifying pairs compute a
    * containment ≤ their true value and still fall to the final
    * filter — exactness is unchanged, as SetJoinSpec's brute-force
    * parity pins. All keep conditions are written as the same IEEE
    * division verification computes, so no float-boundary
    * disagreement is possible. */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentJoin threshold must be in (0, 1], got $threshold")
    val t = lit(threshold)
    val p = prefixed(df, idCol, textCol,
      len => (len - ceil(t * len) + 1).cast("int"))
    smallVocab(p) match {
      case Some(vm) => containmentMasked(p.pref, vm, t)
      case None => containmentGeneral(p.pref, t)
    }
  }

  private def containmentGeneral(pref: DataFrame, t: Column): DataFrame = {
    val probe = pref.select(col("id"), col("len"),
        size(col("pref")).as("plen"), posexplode(col("pref")))
      .toDF("id", "len", "plen", "p0", "tok")
      .select(col("id"), col("len"), col("plen"),
        (col("p0") + 1).as("pos"), col("tok"))
    val index = pref.select(col("id"), col("len"),
        posexplode(col("toks")))
      .toDF("id", "len", "p0", "tok")
      .select(col("id"), col("len"), (col("p0") + 1).as("pos"),
        col("tok"))
    val bound = posBound("a", "b")
    val cand = probe.as("a").join(index.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.id") =!= col("b.id") &&
          bound.cast("double") / col("a.len").cast("double") >= t)
      .groupBy(col("a.id").as("idA"), col("b.id").as("idB"),
        col("a.len").as("lenA"), col("a.plen").as("plenA"),
        col("b.len").as("lenB"))
      .agg(count(lit(1)).as("m"), max(col("b.pos")).as("maxPosB"))
      .filter((col("m") + least(col("lenA") - col("plenA"),
          col("lenB") - col("maxPosB"))).cast("double") /
        col("lenA").cast("double") >= t)
    val sets = pref.select(col("id"), col("toks"))
    cand
      .join(sets.as("sa"), col("idA") === col("sa.id"))
      .join(sets.as("sb"), col("idB") === col("sb.id"))
      .select(col("idA"), col("idB"),
        ((col("m") + size(array_intersect(
            slice(col("sa.toks"), col("plenA") + 1,
              greatest(col("lenA") - col("plenA"), lit(0))),
            col("sb.toks")))).cast("double") /
          col("lenA").cast("double")).as("containment"))
      .filter(col("containment") >= t)
  }

  /** Pre-flight skew diagnostic: the size of every prefix-token
    * bucket the Jaccard join at `threshold` would probe, largest
    * first. Candidate pairs cost Σ bucket·(bucket-1)/2 before the
    * length filter — a family-sized top bucket (boilerplate clones)
    * means the exact join will pay that family's quadratic candidates
    * and the corpus should be deduped first (see the class doc's
    * threshold-boundary note). One aggregation over the same prefixed
    * frame the join itself builds. */
  def prefixBucketStats(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"prefixBucketStats threshold must be in (0, 1], got $threshold")
    val t = lit(threshold)
    prefixed(df, idCol, textCol,
        len => (len - ceil(t * len) + 1).cast("int"))
      .pref
      .select(explode(col("pref")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("bucket_size"))
      .orderBy(col("bucket_size").desc, col("tok").asc)
  }

  /** Mask-residual Jaccard join (see [[smallVocab]]): one equi-join
    * on prefix postings; similarity, threshold, and first-match pair
    * dedup are all scalar residuals. The dedup tests PREFIX masks —
    * only tokens posted by BOTH sides generate meetings, so the kept
    * meeting must be the lowest-canon member of prefA ∩ prefB. The
    * division is the same IEEE op the general path and the oracle
    * compute, over the same integers (popcounts == intersect/union
    * sizes), so results are bit-identical across paths. */
  private def jaccardMasked(pref: DataFrame, vm: VocabMasks,
      t: Column): DataFrame = {
    val posts = pref.select(col("id"),
        maskOf(col("toks"), vm.rank).as("mask"),
        maskOf(col("pref"), vm.rank).as("pmask"),
        explode(col("pref")).as("tok"))
      .withColumn("rk", vm.rank(col("tok")))
    val inter = bit_count(col("a.mask").bitwiseAND(col("b.mask")))
    val uni = bit_count(col("a.mask").bitwiseOR(col("b.mask")))
    val jac = inter.cast("double") / uni.cast("double")
    posts.as("a").join(posts.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          col("a.pmask").bitwiseAND(col("b.pmask"))
            .bitwiseAND(call_function("shiftleft", lit(1L), col("a.rk")) - lit(1L))
            === lit(0L) &&
          jac >= t)
      .select(col("a.id").as("idA"), col("b.id").as("idB"),
        jac.as("jaccard"))
  }

  /** Mask-residual containment join (see [[smallVocab]]): probe posts
    * its prefix, the index still posts all tokens (the containment
    * asymmetry is unchanged — only the representation got cheaper).
    * First-match dedup can test the FULL probe mask: a probe token
    * with canon rank below a prefix token's rank sits earlier in the
    * canon-sorted array and is therefore itself in the prefix. */
  private def containmentMasked(pref: DataFrame, vm: VocabMasks,
      t: Column): DataFrame = {
    val probe = pref.select(col("id"),
        maskOf(col("toks"), vm.rank).as("mask"),
        explode(col("pref")).as("tok"))
      .withColumn("rk", vm.rank(col("tok")))
    val index = pref.select(col("id"),
        maskOf(col("toks"), vm.rank).as("mask"),
        explode(col("toks")).as("tok"))
    val inter = bit_count(col("a.mask").bitwiseAND(col("b.mask")))
    val cont = inter.cast("double") /
      bit_count(col("a.mask")).cast("double")
    probe.as("a").join(index.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id") &&
          col("a.mask").bitwiseAND(col("b.mask"))
            .bitwiseAND(call_function("shiftleft", lit(1L), col("a.rk")) - lit(1L))
            === lit(0L) &&
          cont >= t)
      .select(col("a.id").as("idA"), col("b.id").as("idB"),
        cont.as("containment"))
  }

  private def verifyJaccard(cand: DataFrame, pref: DataFrame,
      t: Column): DataFrame = {
    val sets = pref.select(col("id"), col("toks"))
    cand
      .join(sets.as("sa"), col("idA") === col("sa.id"))
      .join(sets.as("sb"), col("idB") === col("sb.id"))
      .select(col("idA"), col("idB"),
        (size(array_intersect(col("sa.toks"), col("sb.toks")))
          .cast("double") /
          size(array_union(col("sa.toks"), col("sb.toks")))
            .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= t)
  }
}
