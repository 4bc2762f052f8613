package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.KmvFunctions
import graft.operators.{Sampling, SetJoin}
import graft.text.{Boilerplate, TextAnalysis}
import graft.util.Tables

/** Round-9 curation operators: exact set-similarity joins (the
  * deterministic complement to MinHash/SimHash dedup) and hashed
  * importance resampling. Oracles recompute the same integer/single-
  * division arithmetic in DuckDB, so every row hashes bit-identically.
  */
object CurationQueries {

  /** DuckDB-side distinct word-token sets, tokenized exactly like
    * [[graft.text.TextAnalysis.tokens]] (lower, trim, split \s+). */
  private val tokenSetsCte =
    """WITH s AS (SELECT doc_id,
      |  list_distinct(string_split_regex(lower(trim(text)), '\s+')) toks
      |  FROM documents WHERE len(trim(text)) > 0)""".stripMargin

  /** Bitmask representation of the token sets for the all-pairs
    * oracles: one bit per distinct corpus token, so |A∩B| / |A∪B| /
    * |A| read as popcounts of integer AND/OR. This is a
    * REPRESENTATION change only — the oracle still compares every
    * pair against the raw definition; set cardinalities as popcounts
    * is elementary set theory, valid under ANY injective token→bit
    * map (the map here is alphabetical, deliberately unrelated to the
    * engine's canon-rank map, so the two sides cannot share an
    * indexing bug). Without it the sf0.1 oracle ground through 25M
    * list_intersect calls (~205 s per query); with it the same 25M
    * pairs are vectorized integer ops. Fails LOUD via error() if the
    * corpus vocabulary ever exceeds 63 tokens (bit 63 would overflow
    * DuckDB's signed left-shift) — the list_intersect form in git
    * history is the fallback for such a fixture. */
  private val maskCtes =
    """vocab AS (SELECT tok, row_number() OVER (ORDER BY tok) - 1
      |    AS bit
      |  FROM (SELECT DISTINCT unnest(toks) AS tok FROM s)),
      |e AS (SELECT doc_id, unnest(toks) AS tok FROM s),
      |m AS (SELECT e.doc_id,
      |    bit_or(CASE WHEN (SELECT count(*) FROM vocab) <= 63
      |      THEN CAST(1 AS BIGINT) << v.bit
      |      ELSE CAST(error('oracle bitmask replay needs a <=63-token
      | vocabulary; restore the list_intersect form') AS BIGINT)
      |      END) AS mask
      |  FROM e JOIN vocab v USING (tok)
      |  GROUP BY e.doc_id)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // exact Jaccard similarity self-join via prefix filtering
    // (AllPairs/PPJoin family): complete above the threshold with the
    // TRUE similarity attached — the verification MinHash can't give.
    // The oracle brute-forces all pairs (500 docs at sf0.01); the
    // engine must reach the same rows through prefix + length
    // filtering. Single division → bit-identical doubles.
    QueryDef("q_set_sim_join",
      (s, d) => SetJoin.jaccardJoin(Tables.documents(s, d), "doc_id",
        "text", threshold = 0.9),
      Some(s"""$tokenSetsCte,
             |$maskCtes
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |CAST(bit_count(a.mask & b.mask) AS DOUBLE)
             |  / CAST(bit_count(a.mask | b.mask) AS DOUBLE) AS jaccard
             |FROM m a JOIN m b ON a.doc_id < b.doc_id
             |WHERE CAST(bit_count(a.mask & b.mask) AS DOUBLE)
             |  / CAST(bit_count(a.mask | b.mask) AS DOUBLE)
             |  >= 0.9""".stripMargin)),

    // asymmetric containment join at t=1.0: every ordered pair where
    // A's token set is FULLY inside B's — the boilerplate/quotation
    // detector. Probe side posts one rarest token per doc at t=1.0;
    // the container side has no length bound, so it indexes all
    // tokens.
    QueryDef("q_containment_join",
      (s, d) => SetJoin.containmentJoin(Tables.documents(s, d),
        "doc_id", "text", threshold = 1.0),
      Some(s"""$tokenSetsCte,
             |$maskCtes
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |CAST(bit_count(a.mask & b.mask) AS DOUBLE)
             |  / CAST(bit_count(a.mask) AS DOUBLE) AS containment
             |FROM m a JOIN m b ON a.doc_id <> b.doc_id
             |WHERE CAST(bit_count(a.mask & b.mask) AS DOUBLE)
             |  / CAST(bit_count(a.mask) AS DOUBLE) >= 1.0""".stripMargin)),

    // hashed-bigram importance resampling (DSIR shape) toward the
    // English sub-corpus: integer-quantized weights, so DuckDB replays
    // the exact scores and the exact top-100 cut (ties by doc_id).
    QueryDef("q_dsir_resample",
      (s, d) => Sampling.dsirResample(Tables.documents(s, d), "doc_id",
        "text", isTarget = col("lang") === "en", buckets = 256, k = 100)
        .select(col("id").as("doc_id"), col("score")),
      Some("""WITH t AS (SELECT doc_id, lang,
             |  string_split_regex(lower(trim(text)), '\s+') w
             |  FROM documents WHERE len(trim(text)) > 0),
             |f AS (SELECT doc_id, lang,
             |  unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) bg
             |  FROM t WHERE len(w) >= 2),
             |h AS (SELECT doc_id, lang,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(bg, ''),
             |      ch -> CAST(ascii(ch) AS BIGINT))),
             |    (acc, x) -> (acc * 31 + x) % 1000000007) % 256 AS b
             |  FROM f),
             |c AS (SELECT b, CAST(COUNT(*) AS BIGINT) raw_cnt,
             |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             |    AS BIGINT) tgt_cnt
             |  FROM h GROUP BY b),
             |tot AS (SELECT CAST(SUM(raw_cnt) AS BIGINT) tot_r,
             |  CAST(SUM(tgt_cnt) AS BIGINT) tot_t FROM c),
             |wt AS (SELECT b,
             |  ((tgt_cnt + 1) * 1000000 * tot_r)
             |    // ((raw_cnt + 1) * tot_t) AS w
             |  FROM c, tot)
             |SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score
             |FROM h JOIN wt USING (b) GROUP BY doc_id
             |ORDER BY score DESC, doc_id ASC LIMIT 100""".stripMargin)),

    // Gopher line-repetition filters (Rae et al. 2021 §A1.1): per-doc
    // duplicate-line and duplicate-line-character fractions. The
    // fixture corpus has no newlines, so ' the ' stands in as the line
    // delimiter; planted repeats (doc_id%3 / %7, the q_text_redact_pii
    // doctoring pattern) make the duplicate paths non-trivial. All
    // fractions are single divisions of exact integer counts.
    QueryDef("q_dup_line_stats",
      (s, d) => Boilerplate.duplicateSegmentStats(
        Tables.documents(s, d).withColumn("text", doctored),
        "doc_id", "text", " the "),
      Some(s"""WITH d AS (SELECT doc_id, $segListSql AS l FROM documents)
             |SELECT doc_id,
             |  CAST(len(l) AS BIGINT) AS n_lines,
             |  CAST(len(list_distinct(l)) AS BIGINT) AS distinct_lines,
             |  CAST(len(l) - len(list_distinct(l)) AS DOUBLE)
             |    / CAST(len(l) AS DOUBLE) AS dup_line_frac,
             |  CAST(CAST(list_sum(list_transform(l, x -> length(x)))
             |        AS BIGINT) -
             |      CAST(list_sum(list_transform(list_distinct(l),
             |        x -> length(x))) AS BIGINT) AS DOUBLE)
             |    / CAST(list_sum(list_transform(l, x -> length(x)))
             |        AS DOUBLE) AS dup_char_frac
             |FROM d WHERE len(l) > 0""".stripMargin)),

    // C4-style corpus-frequent-line removal (Raffel et al. 2020 §2.2):
    // a line occurring verbatim in >= 10 distinct documents is
    // boilerplate and stripped everywhere. One shuffle to count line
    // document-frequency, then a broadcast join of the small frequent
    // set back against the line table. clean_text (order-preserving
    // rejoin) is spec-covered; the oracle hashes the integer counts +
    // single-division fraction.
    QueryDef("q_boilerplate_strip",
      (s, d) => Boilerplate.stripBoilerplate(
        Tables.documents(s, d).withColumn("text", doctored),
        "doc_id", "text", " the ", minDocs = 10)
        .select(col("doc_id"), col("n_segs"), col("boiler_segs"),
          col("total_chars"), col("boiler_chars"),
          col("boiler_char_frac")),
      Some(s"""WITH d AS (SELECT doc_id, $segListSql AS l FROM documents),
             |s AS (SELECT doc_id, unnest(l) AS seg FROM d),
             |f AS (SELECT seg FROM (
             |    SELECT seg, count(DISTINCT doc_id) AS df
             |    FROM s GROUP BY 1) WHERE df >= 10)
             |SELECT s.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_segs,
             |  CAST(count(f.seg) AS BIGINT) AS boiler_segs,
             |  CAST(sum(length(s.seg)) AS BIGINT) AS total_chars,
             |  CAST(coalesce(sum(length(s.seg))
             |    FILTER (WHERE f.seg IS NOT NULL), 0) AS BIGINT)
             |    AS boiler_chars,
             |  CAST(coalesce(sum(length(s.seg))
             |      FILTER (WHERE f.seg IS NOT NULL), 0) AS DOUBLE)
             |    / CAST(sum(length(s.seg)) AS DOUBLE)
             |    AS boiler_char_frac
             |FROM s LEFT JOIN f ON s.seg = f.seg
             |GROUP BY s.doc_id""".stripMargin)),

    // character-distribution diversity: Simpson/Gini impurity of the
    // per-doc char histogram — the deterministic (transcendental-free)
    // cousin of character entropy, a gibberish/low-diversity signal.
    QueryDef("q_char_diversity",
      (s, d) => Boilerplate.charDiversity(
        Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, ''))
             |    AS c FROM documents WHERE length(text) > 0),
             |cc AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS n
             |  FROM ch GROUP BY 1, 2)
             |SELECT doc_id,
             |  CAST(sum(n) AS BIGINT) AS n_chars,
             |  CAST(count(*) AS BIGINT) AS distinct_chars,
             |  1.0 - CAST(sum(n * n) AS DOUBLE)
             |    / CAST(sum(n) * sum(n) AS DOUBLE) AS char_gini
             |FROM cc GROUP BY doc_id""".stripMargin)),

    // KMV distinct sketch per source: unlike HLL (register layout is
    // engine-defined, envelope-checked in q_summary_sketch), the KMV
    // estimate over a fixed md5-prefix hash is a pure function of the
    // value set — (k-1)*2^48 div h_k replays bit-identically in
    // DuckDB, so the ESTIMATE itself sits under the hash gate. k=16
    // keeps the estimate path live even at sf0.01 (25 docs/source).
    QueryDef("q_kmv_distinct",
      (s, d) => {
        val h = KmvFunctions.kmv_hash48(col("text"))
        Tables.documents(s, d).groupBy(col("source")).agg(
          countDistinct(h).as("exact_distinct"),
          KmvFunctions.kmv_distinct(h, k = 16).as("kmv_estimate"))
      },
      Some("""WITH h AS (SELECT source,
             |    CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT)
             |      AS hv FROM documents),
             |d AS (SELECT DISTINCT source, hv FROM h),
             |r AS (SELECT source, hv,
             |    row_number() OVER (PARTITION BY source ORDER BY hv)
             |      AS rn,
             |    count(*) OVER (PARTITION BY source) AS nd FROM d)
             |SELECT source, CAST(nd AS BIGINT) AS exact_distinct,
             |  CAST(CASE WHEN nd >= 16
             |    THEN (CAST(15 AS BIGINT) * 281474976710656) // hv
             |    ELSE nd END AS BIGINT) AS kmv_estimate
             |FROM r
             |WHERE rn = CASE WHEN nd >= 16 THEN 16 ELSE nd END""".stripMargin)),

    // the remaining Gopher §A1.1 repetition rule: fraction of chars
    // in occurrences of the document's most frequent word bigram.
    // Ties break (count, then lexicographically greatest gram) so the
    // winner is deterministic in any engine; the fraction is one
    // division of exact integers.
    QueryDef("q_top_ngram_frac",
      (s, d) => TextAnalysis.topNgramStats(Tables.documents(s, d),
        "doc_id", "text", n = 2),
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(length(trim(text)) AS BIGINT) AS tl,
             |    string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents WHERE len(trim(text)) > 0),
             |b AS (SELECT doc_id, tl,
             |    unnest([w[i] || ' ' || w[i+1]
             |      for i in range(1, len(w))]) AS bg
             |  FROM t WHERE len(w) >= 2),
             |c AS (SELECT doc_id, tl, bg,
             |    CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2, 3),
             |r AS (SELECT doc_id, tl, bg, c, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY c DESC, bg DESC) AS rn
             |  FROM c)
             |SELECT doc_id, bg AS top_ngram, c AS top_count,
             |  CAST(c * length(bg) AS DOUBLE) / CAST(tl AS DOUBLE)
             |    AS top_char_frac
             |FROM r WHERE rn = 1""".stripMargin)),

    // n-gram coverage of a held-out slice against the rest of the
    // corpus: the SOFT contamination score (fraction of a doc's
    // distinct 3-grams seen in the reference) complementing the hard
    // overlap flag of q_decontaminate. Split on doc_id % 10 — the
    // fixture's deterministic train/test axis.
    QueryDef("q_ngram_coverage",
      (s, d) => {
        val docs = Tables.documents(s, d)
        TextAnalysis.ngramCoverage(
          docs.filter(col("doc_id") % 10 === 0),
          docs.filter(col("doc_id") % 10 =!= 0),
          "doc_id", "text", n = 3)
      },
      Some("""WITH t AS (SELECT doc_id,
             |    string_split_regex(lower(trim(text)), '\s+') AS w
             |  FROM documents),
             |s AS (SELECT doc_id, list_distinct(
             |    [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
             |     for i in range(1, len(w) - 1)]) AS sh
             |  FROM t),
             |te AS (SELECT doc_id, unnest(sh) AS g FROM s
             |  WHERE doc_id % 10 = 0),
             |tr AS (SELECT DISTINCT unnest(sh) AS g FROM s
             |  WHERE doc_id % 10 <> 0)
             |SELECT te.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(count(tr.g) AS BIGINT) AS covered_grams,
             |  CAST(count(tr.g) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             |    AS coverage
             |FROM te LEFT JOIN tr ON te.g = tr.g
             |GROUP BY te.doc_id""".stripMargin)),

    // KMV set algebra: Jaccard overlap between two OVERLAPPING corpus
    // slices (doc_id%3!=0 vs doc_id%2=0, true J ~ 0.4) estimated
    // purely from two stored k=16 sketches — union/intersect/estimate
    // are array built-ins over the sketches (kmv_union/kmv_jaccard/
    // kmv_estimate), never re-touching the corpus. Both the estimate
    // and the exact hash-set Jaccard are integer-exact + one division,
    // so DuckDB replays them bit-identically.
    QueryDef("q_kmv_jaccard",
      (s, d) => {
        import graft.functions.KmvFunctions._
        val base = Tables.documents(s, d)
          .withColumn("hv", kmv_hash48(col("text")))
        val ska = base.filter(col("doc_id") % 3 =!= 0)
          .groupBy(col("lang")).agg(kmv_sketch(col("hv"), 16).as("sa"))
        val skb = base.filter(col("doc_id") % 2 === 0)
          .groupBy(col("lang")).agg(kmv_sketch(col("hv"), 16).as("sb"))
        val est = ska.join(skb, Seq("lang")).select(col("lang"),
          kmv_jaccard(col("sa"), col("sb"), 16).as("kmv_jaccard_est"),
          kmv_estimate(kmv_union(col("sa"), col("sb"), 16), 16)
            .as("kmv_union_est"))
        val flags = base.groupBy(col("lang"), col("hv")).agg(
          max(when(col("doc_id") % 3 =!= 0, 1).otherwise(0)).as("ea"),
          max(when(col("doc_id") % 2 === 0, 1).otherwise(0)).as("eb"))
          .filter(col("ea") + col("eb") > 0)
        val exact = flags.groupBy(col("lang")).agg(
          sum((col("ea") * col("eb")).cast("long")).as("inter"),
          count(lit(1)).as("uni"))
          .select(col("lang"), col("uni").as("exact_union"),
            (col("inter").cast("double") / col("uni").cast("double"))
              .as("exact_jaccard"))
        est.join(exact, Seq("lang")).select(col("lang"),
          col("exact_union"), col("exact_jaccard"),
          col("kmv_union_est"), col("kmv_jaccard_est"))
      },
      Some("""WITH h AS (SELECT lang, doc_id,
             |    CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT)
             |      AS hv FROM documents),
             |ra AS (SELECT lang, hv, row_number() OVER (
             |    PARTITION BY lang ORDER BY hv) AS rn
             |  FROM (SELECT DISTINCT lang, hv FROM h
             |        WHERE doc_id % 3 <> 0)),
             |rb AS (SELECT lang, hv, row_number() OVER (
             |    PARTITION BY lang ORDER BY hv) AS rn
             |  FROM (SELECT DISTINCT lang, hv FROM h
             |        WHERE doc_id % 2 = 0)),
             |sa AS (SELECT lang, list_sort(list(hv)) AS s FROM ra
             |  WHERE rn <= 16 GROUP BY lang),
             |sb AS (SELECT lang, list_sort(list(hv)) AS s FROM rb
             |  WHERE rn <= 16 GROUP BY lang),
             |uni AS (SELECT sa.lang, sa.s AS a, sb.s AS b,
             |    list_slice(list_sort(list_distinct(sa.s || sb.s)),
             |      1, 16) AS ku
             |  FROM sa JOIN sb ON sa.lang = sb.lang),
             |est AS (SELECT lang,
             |    CAST(len(list_intersect(list_intersect(ku, a), b))
             |        AS DOUBLE) / CAST(len(ku) AS DOUBLE)
             |      AS kmv_jaccard_est,
             |    CAST(CASE WHEN len(ku) < 16 THEN len(ku)
             |      ELSE (CAST(15 AS BIGINT) * 281474976710656) // ku[16]
             |      END AS BIGINT) AS kmv_union_est
             |  FROM uni),
             |p AS (SELECT lang, hv,
             |    max(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS ea,
             |    max(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS eb
             |  FROM h GROUP BY 1, 2),
             |ex AS (SELECT lang,
             |    CAST(SUM(ea * eb) AS BIGINT) AS inter,
             |    CAST(COUNT(*) AS BIGINT) AS uni_n
             |  FROM p WHERE ea + eb > 0 GROUP BY 1)
             |SELECT est.lang, ex.uni_n AS exact_union,
             |  CAST(ex.inter AS DOUBLE) / CAST(ex.uni_n AS DOUBLE)
             |    AS exact_jaccard,
             |  est.kmv_union_est, est.kmv_jaccard_est
             |FROM est JOIN ex ON est.lang = ex.lang""".stripMargin)),

    // PERSISTED per-partition sketches (the 100 TB discipline the KMV
    // scaladoc promises): each ingest day's silver load also lands an
    // O(k) sketch row via Lake.writePartitionSketches; cross-partition
    // distinct/overlap questions are then answered from the STORED
    // sketch table alone — the corpus is never re-scanned. Every
    // downstream number is integer/single-division arithmetic over
    // the portable md5-prefix hash, so DuckDB rebuilding the same
    // sketches from raw rows must land bit-identically.
    QueryDef("q_kmv_partitioned",
      (s, d) => {
        import graft.functions.KmvFunctions._
        val tbl = "kmv_sketches_q"
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        val loc = new org.apache.hadoop.fs.Path(
          s.sessionState.catalog.defaultTablePath(
            s.sessionState.sqlParser.parseTableIdentifier(tbl)))
        val fs = loc.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(loc)) fs.delete(loc, true)
        val docs = Tables.documents(s, d)
          .withColumn("hv", kmv_hash48(col("text")))
          .withColumn("ingest_on", concat(lit("2024_01_0"),
            ((col("doc_id") % 3) + 1).cast("string")))
        // one load per day — the sketch table accrues with the silver
        // layer, partition by partition
        for (day <- 1 to 3)
          graft.lake.Lake.writePartitionSketches(s,
            docs.filter(col("ingest_on") === s"2024_01_0$day"),
            tbl, "hv", k = 16)
        val stored = s.table(tbl)
        val daily = stored.select(col("ingest_on"),
          kmv_estimate(col("sketch"), 16).as("kmv_day"))
        val allDays = stored
          .select(explode(col("sketch")).as("hv"))
          .agg(kmv_distinct(col("hv"), 16).as("kmv_all_days"))
        // the union reads back through the CHECKED variant: build_k
        // persisted beside the sketches proves k=16 is a sound read
        // (a truncated-tail read would raise here, not bias low)
        val d1 = stored.filter(col("ingest_on") === "2024_01_01")
          .select(col("sketch").as("sa"), col("build_k").as("ka"))
        val d2 = stored.filter(col("ingest_on") === "2024_01_02")
          .select(col("sketch").as("sb"), col("build_k").as("kb"))
        val overlap = d1.crossJoin(d2).select(
          kmv_estimate(kmv_union_checked(col("sa"), col("ka"),
            col("sb"), col("kb"), 16), 16).as("kmv_union12"),
          kmv_jaccard(col("sa"), col("sb"), 16).as("kmv_j12"))
        daily.crossJoin(allDays).crossJoin(overlap)
          .select(col("ingest_on"), col("kmv_day"),
            col("kmv_all_days"), col("kmv_union12"), col("kmv_j12"))
      },
      Some("""WITH h AS (SELECT
             |    concat('2024_01_0', CAST((doc_id % 3) + 1 AS VARCHAR))
             |      AS ingest_on,
             |    CAST(concat('0x', substr(md5(text), 1, 12)) AS BIGINT)
             |      AS hv FROM documents),
             |sk AS (SELECT ingest_on,
             |    list_slice(list_sort(list(DISTINCT hv)), 1, 16)
             |      AS sketch
             |  FROM h GROUP BY 1),
             |day AS (SELECT ingest_on, CAST(CASE WHEN len(sketch) >= 16
             |    THEN (CAST(15 AS BIGINT) * 281474976710656) // sketch[16]
             |    ELSE len(sketch) END AS BIGINT) AS kmv_day FROM sk),
             |allu AS (SELECT
             |    list_slice(list_sort(list(DISTINCT hv)), 1, 16) AS u
             |  FROM (SELECT unnest(sketch) AS hv FROM sk)),
             |alle AS (SELECT CAST(CASE WHEN len(u) >= 16
             |    THEN (CAST(15 AS BIGINT) * 281474976710656) // u[16]
             |    ELSE len(u) END AS BIGINT) AS kmv_all_days FROM allu),
             |ab AS (SELECT
             |    (SELECT sketch FROM sk WHERE ingest_on = '2024_01_01')
             |      AS sa,
             |    (SELECT sketch FROM sk WHERE ingest_on = '2024_01_02')
             |      AS sb),
             |uni AS (SELECT sa, sb,
             |    list_slice(list_sort(list_distinct(list_concat(sa, sb))),
             |      1, 16) AS ku FROM ab),
             |ov AS (SELECT CAST(CASE WHEN len(ku) >= 16
             |    THEN (CAST(15 AS BIGINT) * 281474976710656) // ku[16]
             |    ELSE len(ku) END AS BIGINT) AS kmv_union12,
             |  CAST(len(list_intersect(list_intersect(ku, sa), sb))
             |      AS DOUBLE) / CAST(len(ku) AS DOUBLE) AS kmv_j12
             |  FROM uni)
             |SELECT day.ingest_on, day.kmv_day, alle.kmv_all_days,
             |  ov.kmv_union12, ov.kmv_j12
             |FROM day CROSS JOIN alle CROSS JOIN ov""".stripMargin)),

    // bottom-k-by-hash ORDER SAMPLE sketch (the quantile sibling of
    // the KMV cardinality sketch): the k smallest (id-hash, value)
    // pairs per language are a simple random sample of the rows that
    // is a pure function of the row set, and the union of per-group
    // bottom-k samples is EXACTLY the global bottom-k — so the stored
    // per-lang sketch column answers the corpus-level median without
    // re-touching the corpus. A quantile read is a genuinely observed
    // value (lower-index rule, no interpolation), so every number
    // replays bit-identically in DuckDB. percentile_approx can't do
    // any of this: its sketch is engine-internal and unmergeable
    // across engines.
    QueryDef("q_kmv_quantile",
      (s, d) => {
        import graft.functions.KmvFunctions._
        val docs = Tables.documents(s, d).select(col("lang"),
          kmv_hash48(col("doc_id")).as("hv"),
          col("n_chars").cast("double").as("v"))
        val per = docs.groupBy(col("lang"))
          .agg(kmv_sample(col("hv"), col("v"), 32).as("sk"))
        val perQ = per.select(col("lang"),
          size(col("sk")).cast("long").as("sample_n"),
          kmv_sample_quantile(col("sk"), 0.5).as("p50"),
          kmv_sample_quantile(col("sk"), 0.9).as("p90"))
        // corpus-level median purely from the STORED per-lang
        // sketches: explode + re-aggregate (lossless by the
        // bottom-k-of-union property)
        val global = per.select(explode(col("sk")).as("e"))
          .agg(kmv_sample(col("e.h"), col("e.v"), 32).as("g"))
          .select(kmv_sample_quantile(col("g"), 0.5).as("global_p50"))
        perQ.crossJoin(global)
      },
      Some("""WITH h AS (SELECT lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
             |      1, 12)) AS BIGINT) AS hv,
             |    CAST(n_chars AS DOUBLE) AS v FROM documents),
             |d AS (SELECT DISTINCT lang, hv, v FROM h),
             |r AS (SELECT lang, hv, v, row_number() OVER (
             |    PARTITION BY lang ORDER BY hv, v) AS rn FROM d),
             |sk AS (SELECT lang, list_sort(list(v)) AS vs,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM r WHERE rn <= 32 GROUP BY lang),
             |per AS (SELECT lang, n AS sample_n,
             |    vs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1] AS p50,
             |    vs[CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1] AS p90
             |  FROM sk),
             |g AS (SELECT hv, v, row_number() OVER (ORDER BY hv, v)
             |    AS rn FROM (SELECT DISTINCT hv, v FROM h)),
             |gs AS (SELECT list_sort(list(v)) AS vs, count(*) AS n
             |  FROM g WHERE rn <= 32),
             |gl AS (SELECT vs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
             |    AS global_p50 FROM gs)
             |SELECT per.lang, per.sample_n, per.p50, per.p90,
             |  gl.global_p50
             |FROM per CROSS JOIN gl""".stripMargin)),

    // equi-join size PREFLIGHT from stored sketches: price
    // |lineitem ⋈ lineitem on l_partkey| (the self-join blowup
    // preflights exist for) and |lineitem ⋈ part| from two O(k)
    // key-count samples — never shuffling a corpus byte — next to
    // the exact sizes computed from the count tables. The bottom-k
    // join synopsis is deterministic integer/decimal arithmetic over
    // the portable hash, so both estimates replay bit-identically in
    // DuckDB. At sf0.01 the 2k-part key domain overfills k=256 and
    // the scaled estimator path is live; at sf0.001 the sketches
    // hold every key and the "estimate" is exact.
    QueryDef("q_join_preflight",
      (s, d) => {
        import graft.functions.KmvFunctions._
        val k = 256
        val ca = Tables.lineitem(s, d).groupBy(col("l_partkey"))
          .agg(count(lit(1)).cast("double").as("c"))
          .select(col("l_partkey").as("key"), col("c"),
            kmv_hash48(col("l_partkey")).as("h"))
        val cb = Tables.part(s, d).groupBy(col("p_partkey"))
          .agg(count(lit(1)).cast("double").as("c"))
          .select(col("p_partkey").as("key"), col("c"),
            kmv_hash48(col("p_partkey")).as("h"))
        val ska = ca.agg(kmv_sample(col("h"), col("c"), k).as("sa"))
        val skb = cb.agg(kmv_sample(col("h"), col("c"), k).as("sb"))
        val exactSelf = ca.agg(
          sum((col("c") * col("c")).cast("decimal(38,0)"))
            .cast("long").as("exact_self_pairs"))
        val exactAb = ca.join(cb, "key").agg(
          sum((ca("c") * cb("c")).cast("decimal(38,0)"))
            .cast("long").as("exact_li_part_pairs"))
        ska.crossJoin(skb).crossJoin(exactSelf).crossJoin(exactAb)
          .select(
            kmv_join_size(col("sa"), col("sa"), k).as("est_self_pairs"),
            col("exact_self_pairs"),
            kmv_join_size(col("sa"), col("sb"), k)
              .as("est_li_part_pairs"),
            col("exact_li_part_pairs"))
      },
      Some("""WITH ca AS (SELECT l_partkey AS key,
             |    CAST(count(*) AS DOUBLE) AS c,
             |    CAST(concat('0x', substr(md5(CAST(l_partkey AS
             |      VARCHAR)), 1, 12)) AS BIGINT) AS h
             |  FROM lineitem GROUP BY l_partkey),
             |cb AS (SELECT p_partkey AS key,
             |    CAST(count(*) AS DOUBLE) AS c,
             |    CAST(concat('0x', substr(md5(CAST(p_partkey AS
             |      VARCHAR)), 1, 12)) AS BIGINT) AS h
             |  FROM part GROUP BY p_partkey),
             |sa AS (SELECT h, c FROM (SELECT h, c, row_number()
             |    OVER (ORDER BY h, c) AS rn
             |  FROM (SELECT DISTINCT h, c FROM ca)) WHERE rn <= 256),
             |sb AS (SELECT h, c FROM (SELECT h, c, row_number()
             |    OVER (ORDER BY h, c) AS rn
             |  FROM (SELECT DISTINCT h, c FROM cb)) WHERE rn <= 256),
             |hu2 AS (SELECT h FROM (SELECT h, row_number()
             |    OVER (ORDER BY h) AS rn
             |  FROM (SELECT DISTINCT h FROM (SELECT h FROM sa
             |    UNION ALL SELECT h FROM sb))) WHERE rn <= 256),
             |t2 AS (SELECT max(h) AS tau, CAST(count(*) AS BIGINT)
             |    AS n FROM hu2),
             |s2 AS (SELECT CAST(COALESCE(SUM(sa.c * sb.c), 0)
             |    AS BIGINT) AS s
             |  FROM hu2 JOIN sa USING (h) JOIN sb USING (h)),
             |t1 AS (SELECT max(h) AS tau, CAST(count(*) AS BIGINT)
             |    AS n FROM sa),
             |s1 AS (SELECT CAST(SUM(sa.c * sa.c) AS BIGINT) AS s
             |  FROM sa),
             |ex AS (SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,0)))
             |    AS BIGINT) AS exact_self_pairs FROM ca),
             |exab AS (SELECT CAST(SUM(CAST(ca.c * cb.c
             |    AS DECIMAL(38,0))) AS BIGINT) AS exact_li_part_pairs
             |  FROM ca JOIN cb USING (key))
             |SELECT
             |  CAST(CASE WHEN t1.n < 256 THEN s1.s
             |    ELSE (CAST(s1.s AS HUGEINT) *
             |      ((CAST(255 AS BIGINT) * 281474976710656) // t1.tau))
             |      // 256 END AS BIGINT) AS est_self_pairs,
             |  ex.exact_self_pairs,
             |  CAST(CASE WHEN t2.n < 256 THEN s2.s
             |    ELSE (CAST(s2.s AS HUGEINT) *
             |      ((CAST(255 AS BIGINT) * 281474976710656) // t2.tau))
             |      // 256 END AS BIGINT) AS est_li_part_pairs,
             |  exab.exact_li_part_pairs
             |FROM t1 CROSS JOIN s1 CROSS JOIN t2 CROSS JOIN s2
             |CROSS JOIN ex CROSS JOIN exab""".stripMargin)),

    // temperature (α = 0.5) language sampling — the mT5/XLM-R mixture
    // rule upweighting low-resource languages: n_l ∝ sqrt(c_l),
    // allocation integer-quantized (sqrt/×/floor are all IEEE
    // correctly-rounded, so the micro-unit weights replay exactly),
    // floor shortfall re-dealt by largest remainder to uncapped
    // groups, selection by portable content-hash rank.
    QueryDef("q_temperature_sample",
      (s, d) => graft.operators.Sampling.temperatureSample(
        Tables.documents(s, d), "lang", "doc_id", total = 200L)
        .select(col("doc_id"), col("lang")),
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS c
             |  FROM documents GROUP BY 1),
             |q AS (SELECT lang, c,
             |    CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000.0)
             |      AS BIGINT) AS qi FROM c),
             |b AS (SELECT lang, c,
             |    least(c, (200 * qi) // sq) AS base,
             |    (200 * qi) % sq AS rem
             |  FROM q CROSS JOIN
             |    (SELECT CAST(SUM(qi) AS BIGINT) AS sq FROM q)),
             |rk AS (SELECT lang, c, base, row_number() OVER (
             |    PARTITION BY (base < c)
             |    ORDER BY rem DESC, lang ASC NULLS LAST) AS seat
             |  FROM b),
             |a AS (SELECT lang, base + (CASE WHEN base < c AND
             |    seat <= 200 - (SELECT CAST(SUM(base) AS BIGINT) FROM b)
             |    THEN 1 ELSE 0 END) AS n_l FROM rk),
             |h AS (SELECT doc_id, lang,
             |  list_reduce(list_prepend(CAST(0 AS BIGINT),
             |    list_transform(string_split(CAST(doc_id AS VARCHAR), ''),
             |      ch -> CAST(ascii(ch) AS BIGINT))),
             |    (acc, x) -> (acc * 31 + x) % 1000000007) AS hh
             |  FROM documents),
             |r AS (SELECT doc_id, lang, row_number() OVER (
             |    PARTITION BY lang ORDER BY hh ASC, doc_id ASC) AS rn
             |  FROM h)
             |SELECT r.doc_id, r.lang FROM r JOIN a USING (lang)
             |WHERE rn <= n_l""".stripMargin))
  )

  /** Fixture doctoring for the line-level queries: the corpus has no
    * newlines and no real boilerplate, so plant deterministic repeat
    * lines (delimited by the stand-in ' the ') on doc_id residues —
    * the same planted-signal pattern q_text_redact_pii uses. */
  private def doctored: Column =
    concat(col("text"),
      when(col("doc_id") % 3 === 0, lit(" the all rights reserved"))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        lit(" the all rights reserved the subscribe today"))
        .otherwise(lit("")))

  /** DuckDB twin of [[doctored]] piped through
    * [[graft.text.Boilerplate.segments]] (trim + drop empties). */
  private def segListSql: String =
    """list_filter(list_transform(string_split(
      |    text ||
      |    (CASE WHEN doc_id % 3 = 0
      |      THEN ' the all rights reserved' ELSE '' END) ||
      |    (CASE WHEN doc_id % 7 = 0
      |      THEN ' the all rights reserved the subscribe today'
      |      ELSE '' END),
      |    ' the '), x -> trim(x)), x -> x <> '')""".stripMargin
}
