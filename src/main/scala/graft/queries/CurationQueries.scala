package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, SetJoin}
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
      Some(s"""$tokenSetsCte
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |  / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE)
             |  AS jaccard
             |FROM s a JOIN s b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |  / CAST(len(list_distinct(a.toks || b.toks)) AS DOUBLE)
             |  >= 0.9""".stripMargin)),

    // asymmetric containment join at t=1.0: every ordered pair where
    // A's token set is FULLY inside B's — the boilerplate/quotation
    // detector. Probe side posts one rarest token per doc at t=1.0;
    // the container side has no length bound, so it indexes all
    // tokens.
    QueryDef("q_containment_join",
      (s, d) => SetJoin.containmentJoin(Tables.documents(s, d),
        "doc_id", "text", threshold = 1.0),
      Some(s"""$tokenSetsCte
             |SELECT a.doc_id AS idA, b.doc_id AS idB,
             |CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |  / CAST(len(a.toks) AS DOUBLE) AS containment
             |FROM s a JOIN s b ON a.doc_id <> b.doc_id
             |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             |  / CAST(len(a.toks) AS DOUBLE) >= 1.0""".stripMargin)),

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
             |ORDER BY score DESC, doc_id ASC LIMIT 100""".stripMargin))
  )
}
