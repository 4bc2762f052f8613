package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line/segment-level repetition and boilerplate operators — the two
  * standard pretraining corpus filters that work on LINES rather than
  * n-grams:
  *
  *  - per-document duplicate-line fractions (the Gopher repetition
  *    rules: a page whose lines repeat is navigation chrome or
  *    keyword stuffing, not prose);
  *  - corpus-level frequent-line removal (the C4 rule: a line that
  *    appears verbatim in many distinct documents is boilerplate —
  *    cookie banners, licence headers, "terms of use" — and is
  *    stripped from every document that carries it).
  *
  * The per-document statistics are a narrow map (array functions over
  * one row, whole-stage codegen, no shuffle). The corpus-level pass is
  * the interesting one at 100 TB: one shuffle keyed on the line to
  * count document frequency (map-side partial aggregation), then a
  * join of the line table against the SMALL frequent set — broadcast
  * by default, because a line qualifying in ≥ minDocs documents bounds
  * the frequent-set cardinality at totalLines/minDocs and in practice
  * boilerplate vocabularies are tiny relative to the corpus; pass
  * `broadcastFrequent = false` to fall back to a shuffle join when a
  * pathological corpus inflates it.
  *
  * All reported fractions are single IEEE divisions of exact integer
  * counts, so results hash bit-identically in any engine at any
  * parallelism.
  */
object Boilerplate {

  /** Delimiter-split segments of a document: split on the LITERAL
    * `delim` (quoted before it reaches the regex engine), trimmed,
    * empty segments dropped. Production text uses "\n"; corpora
    * without newlines pick any token that marks a boundary. */
  def segments(text: Column, delim: String): Column =
    filter(
      transform(split(text, java.util.regex.Pattern.quote(delim)),
        s => trim(s)),
      s => s =!= "")

  /** Per-document duplicate-segment statistics (Gopher repetition
    * filters at line granularity) over delimiter-split segments:
    * `n_lines`, `distinct_lines`, `dup_line_frac` (fraction of line
    * OCCURRENCES that repeat an earlier line) and `dup_char_frac`
    * (fraction of line CHARACTERS inside those repeats). Documents
    * with zero segments are dropped — there is nothing to measure.
    *
    * Scale shape: narrow per-row map, no shuffle; the whole stage
    * stays inside whole-stage codegen. */
  def duplicateSegmentStats(docs: DataFrame, idCol: String,
      textCol: String, delim: String): DataFrame = {
    def charLen(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, s) => acc + length(s))
    docs
      .select(col(idCol).as("doc_id"),
        segments(col(textCol), delim).as("segs"))
      .filter(size(col("segs")) > 0)
      .withColumn("uniq", array_distinct(col("segs")))
      .select(
        col("doc_id"),
        size(col("segs")).cast("long").as("n_lines"),
        size(col("uniq")).cast("long").as("distinct_lines"),
        ((size(col("segs")) - size(col("uniq"))).cast("double") /
          size(col("segs")).cast("double")).as("dup_line_frac"),
        ((charLen(col("segs")) - charLen(col("uniq"))).cast("double") /
          charLen(col("segs")).cast("double")).as("dup_char_frac"))
  }

  /** C4-style corpus-frequent-line removal. A segment is boilerplate
    * when it occurs (verbatim, after trim) in at least `minDocs`
    * DISTINCT documents. Returns one row per document that has ≥ 1
    * segment: per-doc counts, the char-level boilerplate fraction,
    * and `clean_text` — the non-boilerplate segments rejoined in
    * their original order with `rejoinWith`.
    *
    * Plan: posexplode → distinct (doc, seg) → groupBy(seg) count →
    * frequent set → join back → re-aggregate per doc. The per-doc
    * collect_list is bounded by the document's own segment count (a
    * document fits in memory by definition — same bound every
    * text-array operator in this package already relies on). */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      delim: String, minDocs: Int, rejoinWith: String = "\n",
      broadcastFrequent: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val segRows = docs
      .select(col(idCol).as("doc_id"),
        posexplode(segments(col(textCol), delim)).as(Seq("pos", "seg")))
    val freq0 = segRows.select(col("doc_id"), col("seg")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("seg"), lit(true).as("is_boiler"))
    val freq = if (broadcastFrequent) broadcast(freq0) else freq0
    segRows.join(freq, Seq("seg"), "left")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("boiler_segs"),
        sum(length(col("seg")).cast("long")).as("total_chars"),
        sum(when(col("is_boiler"), length(col("seg")).cast("long"))
          .otherwise(0L)).as("boiler_chars"),
        concat_ws(rejoinWith,
          transform(
            array_sort(collect_list(
              when(!col("is_boiler"), struct(col("pos"), col("seg"))))),
            x => x.getField("seg"))).as("clean_text"))
      .withColumn("boiler_char_frac",
        col("boiler_chars").cast("double") /
          col("total_chars").cast("double"))
  }

  /** Character-distribution diversity: Simpson/Gini impurity of the
    * per-document character histogram, `1 - Σ cᵢ² / N²`, plus the
    * distinct-character count. The deterministic cousin of character
    * entropy (no transcendental functions, so the arithmetic
    * reproduces bit-for-bit in any engine): near 0 for
    * single-character runs and other low-diversity junk, high for
    * natural prose. Cross-engine-reproducibility scope: the "unit" is
    * a Java UTF-16 code unit (Spark's `split(text, "")`), and engines
    * disagree on segmentation above that level — DuckDB's
    * `string_split(x, '')` yields grapheme clusters, so combining
    * marks, ZWJ emoji and astral-plane characters produce different
    * histograms there. Bit-identical replay holds for text whose
    * characters are single BMP code points (all of ASCII/Latin-1 and
    * most prose); normalize or re-segment explicitly before comparing
    * scores across engines on corpora beyond that. Narrow per-row
    * map, `O(len log len)`. Documents with empty text are dropped. */
  def charDiversity(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val chars = split(col(textCol), "")
    // sort + run-length fold, O(len log len): the per-distinct
    // filter-count form is O(distinct × len) AND re-splits the text
    // once per distinct character (no CSE inside HOF lambdas — the
    // same trap Dedup.shingleOccurrences documents). Equal chars are
    // adjacent after the sort; one pass accumulates Σrun² and the
    // distinct count, closing the final run in the finish lambda.
    val zero = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0L).as("sumsq"), lit(0L).as("nd"))
    val folded = aggregate(array_sort(chars), zero,
      (st, c) => {
        val same = st.getField("prev") === c
        struct(c.as("prev"),
          when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, st.getField("sumsq"))
            .otherwise(st.getField("sumsq") +
              st.getField("run") * st.getField("run")).as("sumsq"),
          when(same, st.getField("nd"))
            .otherwise(st.getField("nd") + 1L).as("nd"))
      },
      st => struct(
        (st.getField("sumsq") +
          st.getField("run") * st.getField("run")).as("sumsq"),
        st.getField("nd").as("nd")))
    val n = size(chars).cast("long")
    docs
      .filter(length(col(textCol)) > 0)
      .withColumn("__h", folded)
      .select(
        col(idCol).as("doc_id"),
        n.as("n_chars"),
        col("__h.nd").as("distinct_chars"),
        (lit(1.0) - col("__h.sumsq").cast("double") /
          (n * n).cast("double")).as("char_gini"))
  }
}
