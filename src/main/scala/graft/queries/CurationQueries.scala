package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.SetJoin
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
             |  / CAST(len(a.toks) AS DOUBLE) >= 1.0""".stripMargin))
  )
}
