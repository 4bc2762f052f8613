package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus retrieval operators for the training-data pipeline: BM25
  * keyword scoring (the classic "find documents about X in 100 TB"
  * primitive — quality-slice mining, targeted decontamination,
  * eval-set curation) and sliding-window chunking (the RAG/embedding
  * preprocessing step that turns long documents into bounded
  * token-window pieces).
  *
  * Both are exactly oracle-replayable: BM25's floating-point formula
  * is written as ONE fixed operation order (mirrored in the DuckDB
  * oracle), per-document term scores are combined by a fixed-order
  * left-associated add (never a shuffle-order SUM), and the final
  * score is quantized through DECIMAL(18,9) so a last-ulp divergence
  * between engines' `ln` cannot flip a hash (empirically Java
  * `Math.log` and DuckDB `ln` agree bit-for-bit on this host; the
  * quantization is the belt to that suspenders).
  */
object Retrieval {

  /** BM25 scores for a literal keyword query over a document corpus.
    *
    * Returns the `topK` documents by descending score (ties broken by
    * ascending id): (doc_id, n_terms_matched, bm25).
    *
    * Scale shape: the corpus is scanned and tokenized ONCE (into a
    * tracked MEMORY_AND_DISK cache — it feeds both the stats
    * aggregate and the term-frequency branch); tokens are filtered to
    * the query terms BEFORE the (doc, term) aggregation, so only
    * matching occurrences ever shuffle — the reduction is
    * |matches|, not |tokens|. Document frequencies (≤ |terms| rows)
    * and the corpus stats (1 row) come back as broadcasts; the final
    * top-k is a TakeOrdered, never a full sort. At 100 TB the one
    * shuffle is the per-(doc,term) count of query-term hits.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    // persisted (Dedup's tracked cache, spills at scale): the
    // tokenized corpus feeds BOTH the stats aggregate and the tf
    // branch — unpersisted, the corpus would be scanned and
    // TOKENIZED twice, the dominant narrow cost at 100 TB
    val base = graft.dedup.Dedup.persistEager(
      docs.select(col(idCol).as("doc_id"),
          TextAnalysis.tokens(col(textCol)).as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("dl")))
    // one row: N and total token count (avgdl = tot/n as ONE double
    // division — no accumulation-order drift, both are exact BIGINTs)
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))

    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

    // the BM25 atom, ONE fixed operation order mirrored in the oracle:
    //   idf = ln(1 + ((n - df) + 0.5) / (df + 0.5))
    //   s   = idf * ((tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / (tot / n)))))
    val nD = col("n").cast("double"); val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double"); val dlD = col("dl").cast("double")
    val avgdl = col("tot").cast("double") / nD
    val idf = log(lit(1.0) + ((nD - dfD) + lit(0.5)) / (dfD + lit(0.5)))
    val s = idf * ((tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (dlD / avgdl))))

    val scored = tf.join(broadcast(df), Seq("token"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("token"), s.as("s"))
    // fixed-order per-doc combine: one pivot column per query term
    // (each (doc, term) has exactly one row, so MAX is the value
    // itself), then a left-associated add — the score is identical at
    // any parallelism, unlike SUM over shuffle-ordered doubles
    val pivots = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("token") === lit(t), col("s"))).as(s"s_$i")
    }
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(pivots.head, pivots.tail: _*)
    val total = terms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    val matched = terms.indices
      .map(i => when(col(s"s_$i").isNotNull, 1).otherwise(0))
      .reduceLeft(_ + _)
    perDoc.select(col("doc_id"), matched.as("n_terms_matched"),
        total.cast(DecimalType(18, 9)).cast("double").as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Feature-hashed embedding (the "hashing trick"): tokens bucket by
    * a portable base-31 polynomial hash mod `dim`, the vector is the
    * bucket-count histogram as doubles. Deterministic in ANY engine —
    * integer hashing and integer counts, no model weights — which
    * makes an end-to-end retrieval pipeline exactly oracle-checkable;
    * cosine against these vectors is a real lexical similarity (it is
    * a compressed bag-of-words). The same recipe as
    * [[TextAnalysis.polyFingerprint]]'s hash, bucketed instead of
    * minimized. */
  def hashEmbed(toks: Column, dim: Int = 64): Column =
    graft.functions.HashEmbed.hash_embed(toks, dim)

  /** [[hashEmbed]]'s composable-HOF formulation — the executable spec
    * the native expression is property-tested against (the HOF route
    * recomputes the bucket comparison dim× per token interpreted:
    * measured ~260 µs/doc at the ×100 scale run vs one histogram pass
    * native). */
  def hashEmbedComposed(toks: Column, dim: Int = 64): Column = {
    val polyHash = (s: Column) => aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)
    val buckets = transform(toks,
      t => pmod(polyHash(t), lit(dim.toLong)).cast("int"))
    transform(sequence(lit(0), lit(dim - 1)),
      b => size(filter(buckets, x => x === b)).cast("double"))
  }

  /** Sliding-window chunking: split each document's token stream into
    * windows of `size` tokens advancing by `stride` (< size overlaps —
    * the standard RAG/embedding preprocessing shape). Chunk k of a
    * document covers tokens [k·stride, k·stride + size); the last
    * window is the first one whose span reaches the end of the
    * document (shorter than `size` when the tail is short). Empty
    * documents produce no chunks.
    *
    * Returns (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    *
    * Scale shape: a narrow map + generator — no shuffle at any corpus
    * size; output rows ≈ len/stride per document. The token arrays
    * stay inside the per-row expression; only the chunk strings
    * materialize.
    */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 40, stride: Int = 30): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val len = org.apache.spark.sql.functions.size(toks)
    // 1 + ceil(max(0, len - size) / stride) windows; 0 for empty docs.
    // The division is double over exact small ints: an exact-integer
    // quotient is exactly representable, so floor never off-by-ones.
    val nChunks = when(len === 0, lit(0)).otherwise(
      lit(1) + floor((greatest(len - lit(size), lit(0)) +
        lit(stride - 1)) / lit(stride)).cast("int"))
    // guard the generator: sequence(0, -1) would count DOWN (Spark
    // defaults step to -1 when start > stop), not produce 0 windows
    val ids = when(nChunks === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nChunks - lit(1)))
    docs.select(col(idCol).as("doc_id"), toks.as("toks"),
        explode(ids).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("toks"), col("chunk_id") * lit(stride) + lit(1),
          lit(size)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        org.apache.spark.sql.functions.size(col("chunk"))
          .as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Subword (fastText-style) token embedding: the [[hashEmbed]]
    * histogram over the CHARACTER trigrams of `<token>` (boundary
    * markers included, so every non-empty token has ≥ 1 gram and a
    * non-zero vector). Morphologically close tokens share trigram
    * mass, so cosine between these vectors is a graded subword
    * similarity — deterministic in any engine, no model weights. */
  def charGramVec(tok: Column, dim: Int = 64): Column = {
    // bind the padded token once — referencing the concat inside the
    // per-gram lambda re-concatenates per trigram (the HOF-lambda
    // no-CSE trap, Dedup.shingleOccurrences); tokens are short so the
    // constant is small, but the shape should not be quadratic
    val grams = element_at(
      transform(array(concat(lit("<"), tok, lit(">"))), padded =>
        transform(sequence(lit(1), length(padded) - 2),
          i => padded.substr(i, lit(3)))),
      1)
    hashEmbed(grams, dim)
  }

  /** Late-interaction reranking over BM25 candidates (the maxsim
    * scoring shape of ColBERT, Khattab/Zaharia SIGIR'20, public
    * literature; token vectors here are the hashed-subword histograms
    * above, not model weights) — the modern two-stage retrieval
    * pattern: a cheap lexical retriever bounds the candidate set,
    * then per-token vector scoring ranks it.
    * maxsim(q, d) = Σ over query token positions of max over doc
    * tokens of cos(v(q_i), v(d_j)), with [[charGramVec]] token
    * vectors.
    *
    * Returns (doc_id, maxsim, rank) — the `topK` best candidates.
    *
    * Scale shape: the candidate set (≤ `candidates` rows of ids) is a
    * broadcast; only candidate documents are tokenized for scoring, so
    * the quadratic token-pair stage is bounded by candidates ×
    * |query| × distinct-doc-tokens, never by the corpus. BM25 itself
    * shuffles only query-term hits (see [[bm25]]). The final rank
    * window is global but runs AFTER the top-k cut — a ≤ `topK`-row
    * stage at any corpus size, not a scale concern.
    *
    * Determinism: each cosine quantizes by FLOOR to integer 1e-15
    * units (the PageRank discipline — floor is the same function in
    * every engine, unlike double→decimal casts which round HALF_UP in
    * Spark but half-even in DuckDB); per-position max and the final
    * sum are exact integer ops, the ranking sorts the integer, and
    * ties break on doc_id — the rerank replays bit-identically in any
    * engine. */
  def maxSimRerank(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], candidates: Int = 25, topK: Int = 10,
      dim: Int = 64): DataFrame = {
    require(topK >= 1 && candidates >= topK,
      s"need 1 <= topK <= candidates, got $topK/$candidates")
    val cand = bm25(docs, idCol, textCol, queryTerms,
      topK = candidates).select(col("doc_id"))
    // distinct tokens per candidate doc (max over a multiset equals
    // max over its support — duplicates add pairs, not information)
    val dtok = docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("tok"))
      .join(broadcast(cand), "doc_id")
      .select(col("doc_id"), charGramVec(col("tok"), dim).as("dv"))
    // query token positions keep multiplicity: each position
    // contributes its own best match
    val qtok = queryTerms.zipWithIndex.map { case (t, i) =>
      struct(lit(i).as("qpos"), lit(t).as("qt"))
    }
    val qvec = docs.sparkSession.range(1)
      .select(explode(array(qtok: _*)).as("q"))
      .select(col("q.qpos").as("qpos"),
        charGramVec(col("q.qt"), dim).as("qv"))
    val units = dtok.crossJoin(broadcast(qvec))
      .select(col("doc_id"), col("qpos"),
        floor(graft.functions.VectorFunctions.cosine_sim(
          col("dv"), col("qv")) * lit(1e15)).cast("long").as("u"))
    units.groupBy(col("doc_id"), col("qpos"))
      .agg(max(col("u")).as("mu"))
      .groupBy(col("doc_id"))
      .agg(sum(col("mu")).as("su"))
      .orderBy(col("su").desc, col("doc_id").asc)
      .limit(topK)
      .select(col("doc_id"),
        (col("su").cast("double") / lit(1e15)).as("maxsim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("maxsim").desc, col("doc_id").asc)))
  }
}
