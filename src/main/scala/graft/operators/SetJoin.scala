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
    * sliced off. `prefLen` decides Jaccard vs containment. */
  private def prefixed(df: DataFrame, idCol: String, textCol: String,
      prefLen: Column => Column): DataFrame = {
    val base = df
      .select(col(idCol).as("id"), tokenSet(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    // vocabulary-sized document-frequency table; the canon every
    // prefix is cut against must be GLOBAL, so this aggregation is
    // semantically required — one shuffle, then an equi-join back.
    val docFreq = base.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
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
    graft.dedup.Dedup.persistEager(
      ranked.select(col("id"), col("len"), col("toks"),
        slice(col("toks"), lit(1), greatest(prefLen(col("len")), lit(1)))
          .as("pref")))
  }

  /** All unordered pairs `(idA < idB, jaccard)` with word-token
    * Jaccard `>= threshold`, exactly. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccardJoin threshold must be in (0, 1], got $threshold")
    val t = lit(threshold)
    val pref = prefixed(df, idCol, textCol,
      len => (len - ceil(t * len) + 1).cast("int"))
    val probe = pref.select(col("id"), col("len"),
      explode(col("pref")).as("tok"))
    // candidate pairs: shared prefix token + Jaccard length filter —
    // only (id, len, tok) scalars cross this shuffle.
    val cand = probe.as("a").join(probe.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id") &&
          col("b.len") >= ceil(t * col("a.len")) &&
          col("b.len") <= floor(col("a.len") / t) &&
          col("a.len") >= ceil(t * col("b.len")) &&
          col("a.len") <= floor(col("b.len") / t))
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
      .distinct()
    verifyJaccard(cand, pref, t)
  }

  /** All ordered pairs `(idA != idB, containment)` where at least
    * `threshold` of A's tokens appear in B, exactly. */
  def containmentJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"containmentJoin threshold must be in (0, 1], got $threshold")
    val t = lit(threshold)
    val pref = prefixed(df, idCol, textCol,
      len => (len - ceil(t * len) + 1).cast("int"))
    val probe = pref.select(col("id"), explode(col("pref")).as("tok"))
    // index side posts ALL tokens (containment has no length upper
    // bound on the container), probe side only its prefix.
    val index = pref.select(col("id"), explode(col("toks")).as("tok"))
    val cand = probe.as("a").join(index.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("idA"), col("b.id").as("idB"))
      .distinct()
    val sets = pref.select(col("id"), col("toks"))
    cand
      .join(sets.as("sa"), col("idA") === col("sa.id"))
      .join(sets.as("sb"), col("idB") === col("sb.id"))
      .select(col("idA"), col("idB"),
        (size(array_intersect(col("sa.toks"), col("sb.toks")))
          .cast("double") / size(col("sa.toks")).cast("double"))
          .as("containment"))
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
      .select(explode(col("pref")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("bucket_size"))
      .orderBy(col("bucket_size").desc, col("tok").asc)
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
