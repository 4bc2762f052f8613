package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — the entity-resolution /
  * fuzzy-matching primitive (near-identical titles, ids, names) that a
  * plain equi-join can't express and an all-pairs `levenshtein` cross
  * join can't survive at scale.
  *
  * Returns every unordered pair `(id_a < id_b, dist)` with
  * `levenshtein(a, b) <= maxDist`, EXACTLY (candidate generation is a
  * superset; every candidate is verified), without ever comparing all
  * pairs. Candidates come from segment pigeonholing (the PassJoin
  * family, Li/Deng/Feng, public literature): partition each string
  * into `maxDist + 1` contiguous segments — at most `maxDist` edits
  * can touch at most `maxDist` segments, so any qualifying pair shares
  * at least one segment VERBATIM, and that segment's position in the
  * other string shifts by at most `maxDist` (each edit shifts later
  * characters by at most one). Candidate generation is therefore an
  * equi-join on `(segmentIndex, assumedLength, segmentText)` between
  * each string's canonical segments (build side) and every substring
  * within ±maxDist of the canonical position (probe side) — a
  * shuffle-hash/sort-merge join on scalar keys, never a cross product.
  *
  * Scale shape: build emits `maxDist+1` rows per string, probe at most
  * `(maxDist+1)·(2·maxDist+1)²` (deduplicated) — constant fan-out;
  * rows carry `(id, segIdx, len, segment, string)` into the candidate
  * shuffle so verification runs as a join residual (banded 3-arg
  * levenshtein) and only verified scalar pairs reach the final
  * distinct. Low-entropy segments (templated corpora —
  * every id sharing a `"Customer#"`-style prefix) are the known hot
  * spot: the shared prefix makes one bucket hold everything. The
  * `stripCommonPrefix` stage removes exactly that: unit-cost
  * Levenshtein satisfies `ed(c·x, c·y) = ed(x, y)` (matching an equal
  * leading character is always optimal in the DP), so stripping the
  * corpus-global longest common prefix — computed from just
  * `min(str)` / `max(str)`, one aggregation — preserves every pairwise
  * distance while restoring segment entropy.
  *
  * Strings shorter than `maxDist + 1` (post-strip) can't be pigeonholed
  * into non-empty segments; they pair through their DISTINCT VALUES
  * (bounded by the number of distinct strings of length ≤ 2·maxDist,
  * i.e. alphabet-bounded, not corpus-bounded) via a length-band
  * EQUI-join — `levenshtein ≥ |len diff|`, so each short value probes
  * only values within ±maxDist of its length — then expand back to id
  * pairs, output-bound, like any join on duplicated keys.
  *
  * Choosing the threshold: the probe fan-out `(k+1)(2k+1)²` is 27
  * lookups per string at k=1, 75 at k=2, 189 at k=3 — and shorter
  * segments (len/(k+1)) lose entropy, so candidate sets fatten on both
  * axes (measured: SCALING.md's edit_join vs edit_join_k2 rows).
  * PassJoin is the right tool for small fixed k (typo-level dedup,
  * k ≤ 2 on ids/titles); past that, or for LONG strings where a
  * character-budget threshold stops being meaningful, switch to
  * MinHash/n-gram Jaccard candidates ([[graft.dedup.Dedup]]) and treat
  * edit distance as the verifier, not the generator.
  */
object EditJoin {

  /** All unordered pairs within `maxDist` edits: `(id_a, id_b, dist)`
    * with `id_a < id_b`, `dist` the exact Levenshtein distance. Null
    * strings never match (join semantics). */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, stripCommonPrefix: Boolean = true): DataFrame = {
    require(maxDist >= 1,
      "maxDist must be >= 1 — for exact string equality use " +
        "Dedup.exact (one hash aggregation, no candidate stage)")
    val k = maxDist
    val n = k + 1 // segments per string

    val base0 = df.select(col(idCol).cast("long").as("__id"),
      col(strCol).as("__s")).filter(col("__s").isNotNull)

    // corpus-global LCP via min/max: every string shares LCP(min, max)
    // (strings sort lexicographically, so anything between the two
    // extremes starts with their common prefix). Two strings reach the
    // driver — bounded like the IVF centroid pulls. (Construction
    // therefore runs small driver jobs, like bloomPrune's filter
    // build — the literals must exist before the plan does.) The LCP
    // is counted in CODE POINTS, not UTF-16 units: Spark's substring
    // (and levenshtein) walk code points, so a char-unit count would
    // split supplementary-plane characters and corrupt distances.
    val base = if (stripCommonPrefix) {
      val r = base0.agg(min("__s"), max("__s")).head()
      val lcpLen =
        if (r.isNullAt(0)) 0
        else {
          val (a, b) = (r.getString(0).codePoints().toArray,
            r.getString(1).codePoints().toArray)
          a.zip(b).takeWhile(t => t._1 == t._2).length
        }
      if (lcpLen == 0) base0
      else base0.select(col("__id"),
        substring(col("__s"), lcpLen + 1, Int.MaxValue).as("__s"))
    } else base0

    val withLen = base.select(col("__id"), col("__s"),
      length(col("__s")).as("__l"))
    val longSide = withLen.filter(col("__l") >= n)

    // ceil-first segment starts: st(i) = ceil(i*L/n) puts the LONGER
    // (higher-entropy) segments first — on digit-suffix corpora the
    // short trailing segment is the low-entropy one, and shorter
    // segments mean smaller candidate buckets when they do collide.
    def st(i: String, l: String) = s"(($i * $l + ${n - 1}) div $n)"
    def segLen(i: String, l: String) =
      s"(${st(s"($i + 1)", l)} - ${st(i, l)})"

    // build: the k+1 canonical segments of each string. The row
    // carries the (post-strip) string itself: verification runs as a
    // RESIDUAL on the candidate join — the banded levenshtein (3-arg,
    // O(len·k) with early exit) — so no unverified pair ever reaches
    // an exchange and no verification rejoin exists. The string
    // widens the shuffle row by ~n× over the segment alone (bounded),
    // which buys removing the candidate-distinct shuffle entirely —
    // the right trade for entity-resolution-length strings; corpora
    // of long documents want MinHash, not edit distance.
    val segArr =
      s"""transform(sequence(0, $k), i ->
         |  substring(__s, ${st("i", "__l")} + 1, ${segLen("i", "__l")}))"""
        .stripMargin
    val build = longSide.select(col("__id"), col("__l"), col("__s"),
      posexplode(expr(segArr))).toDF("__id", "__l", "__sa", "__i", "__seg")

    // probe: for each segment index and each assumed build length
    // l1 ∈ [L-k, L+k] (capped below at n — the build side has no
    // shorter strings), every substring whose start sits within ±k of
    // the canonical position. Invalid windows null out and filter away;
    // array_distinct collapses windows that repeat the same key.
    // Assumed lengths that exist on NO build string can never match —
    // when the corpus has few distinct lengths (one tiny distinct agg,
    // pulled only if it fits 64 values — fixed-format corpora
    // typically have exactly one), they embed as an IN-list and prune
    // probe fan-out by ~(2k+1)× before the shuffle.
    val lenFilter = {
      val ls = longSide.select(col("__l")).distinct().limit(65)
        .collect().map(_.getInt(0))
      if (ls.length <= 64 && ls.nonEmpty)
        s"filter(sequence(greatest(__l - $k, $n), __l + $k), " +
          s"l1 -> l1 IN (${ls.sorted.mkString(",")}))"
      else s"sequence(greatest(__l - $k, $n), __l + $k)"
    }
    val probeArr =
      s"""flatten(flatten(transform(sequence(0, $k), i ->
         |  transform($lenFilter, l1 ->
         |    filter(transform(sequence(${st("i", "l1")} + 1 - $k,
         |                              ${st("i", "l1")} + 1 + $k), q ->
         |      CASE WHEN q >= 1
         |             AND q + ${segLen("i", "l1")} - 1 <= __l
         |           THEN named_struct('i', i, 'l1', l1,
         |             'seg', substring(__s, q, ${segLen("i", "l1")}))
         |      END), x -> x IS NOT NULL)))))""".stripMargin
    val probe = longSide
      .select(col("__id"), col("__s").as("__sb"),
        explode(array_distinct(expr(probeArr))).as("__p"))
      .select(col("__id"), col("__sb"), col("__p.i").as("__i"),
        col("__p.l1").as("__l1"), col("__p.seg").as("__seg"))

    // candidate equi-join on (segIdx, length, segment) with the
    // verification as a residual: the 3-arg levenshtein returns -1
    // past the threshold, so the filter and the dist column are one
    // computation. A pair found through several matching segments
    // re-verifies redundantly (cheap, O(len·k)) but reaches the final
    // distinct only as an already-verified scalar row.
    val longPairs = build.as("ba")
      .join(probe.as("pb"),
        col("ba.__i") === col("pb.__i") &&
          col("ba.__l") === col("pb.__l1") &&
          col("ba.__seg") === col("pb.__seg") &&
          col("ba.__id") =!= col("pb.__id"))
      .select(least(col("ba.__id"), col("pb.__id")).as("id_a"),
        greatest(col("ba.__id"), col("pb.__id")).as("id_b"),
        levenshtein(col("__sa"), col("__sb"), k).as("dist"))
      .filter(col("dist") >= 0)
      .distinct()

    val strs = withLen.select(col("__id"), col("__s"))

    // short strings (len < n): pair through distinct values. Both
    // value tables are alphabet-bounded (lengths < n and < n+k), and
    // the min-length guard keeps this path disjoint from the long path
    // (which only ever pairs two len >= n strings), so no global dedup
    // is needed. Candidates come from a length-band EQUI-join, not a
    // cross join: levenshtein(a,b) >= |len(a)-len(b)|, so only pairs
    // within ±k of each other's length can qualify — each short value
    // explodes its 2k+1 band lengths and equi-joins the other table's
    // length column, pruning most pairs before any levenshtein runs
    // (a short-string-heavy corpus otherwise pays the full product).
    // Symmetrizing by swapping the banded pairs keeps mixed
    // short-vs-near pairs reachable in either id order.
    val shortVals = withLen.filter(col("__l") < n)
      .select(col("__s"), col("__l")).distinct()
    val nearVals = withLen.filter(col("__l") < n + k)
      .select(col("__s"), col("__l")).distinct()
    val banded = shortVals
      .select(col("__s"),
        explode(sequence(greatest(col("__l") - k, lit(0)),
          col("__l") + k)).as("__lb"))
      .as("va")
      .join(nearVals.as("vb"), col("va.__lb") === col("vb.__l"))
      .select(col("va.__s").as("__sa"), col("vb.__s").as("__sb"))
    val valPairs = banded
      .union(banded.select(col("__sb").as("__sa"), col("__sa").as("__sb")))
      .distinct()
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= k)
    val shortPairs = valPairs
      .join(strs.as("ia"), col("__sa") === col("ia.__s"))
      .join(strs.as("ib"), col("__sb") === col("ib.__s"))
      .filter(col("ia.__id") < col("ib.__id"))
      .select(col("ia.__id").as("id_a"), col("ib.__id").as("id_b"),
        col("dist"))
      .distinct() // (v,v) value pairs reach both cross-join branches

    longPairs.union(shortPairs)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }

  /** Cross-TABLE edit-distance join — the entity-resolution lookup
    * (match scraped titles/names against a canonical catalog within
    * `maxDist` edits): every pair `(left_id, right_id, dist)` with
    * `levenshtein(leftStr, rightStr) <= maxDist`, EXACTLY, by the same
    * PassJoin segment pigeonholing as [[selfJoin]] — canonical
    * segments built on the LEFT, shifted-substring probes on the
    * RIGHT (the pigeonhole argument is one-directional: any right
    * string within k edits of a left string contains one of the
    * left's k+1 segments verbatim within ±k of its position, so one
    * build/probe orientation covers every pair). The common-prefix
    * strip uses the LCP across BOTH sides (distance preservation
    * needs the same prefix removed from each). Strings too short to
    * pigeonhole pair through distinct values with the length-band
    * equi-join, in both orientations (either side may be the short
    * one); the min-length guard keeps the paths disjoint. */
  def join(left: DataFrame, leftIdCol: String, leftStrCol: String,
      right: DataFrame, rightIdCol: String, rightStrCol: String,
      maxDist: Int, stripCommonPrefix: Boolean = true): DataFrame = {
    require(maxDist >= 1,
      "maxDist must be >= 1 — for exact matching use a plain equi-join")
    val k = maxDist
    val n = k + 1

    val l0 = left.select(col(leftIdCol).cast("long").as("__id"),
      col(leftStrCol).as("__s")).filter(col("__s").isNotNull)
    val r0 = right.select(col(rightIdCol).cast("long").as("__id"),
      col(rightStrCol).as("__s")).filter(col("__s").isNotNull)

    val (lBase, rBase) = if (stripCommonPrefix) {
      val row = l0.select(col("__s")).unionAll(r0.select(col("__s")))
        .agg(min("__s"), max("__s")).head()
      val lcpLen =
        if (row.isNullAt(0)) 0
        else {
          val (a, b) = (row.getString(0).codePoints().toArray,
            row.getString(1).codePoints().toArray)
          a.zip(b).takeWhile(t => t._1 == t._2).length
        }
      if (lcpLen == 0) (l0, r0)
      else {
        def strip(df: DataFrame) = df.select(col("__id"),
          substring(col("__s"), lcpLen + 1, Int.MaxValue).as("__s"))
        (strip(l0), strip(r0))
      }
    } else (l0, r0)

    val lLen = lBase.select(col("__id"), col("__s"),
      length(col("__s")).as("__l"))
    val rLen = rBase.select(col("__id"), col("__s"),
      length(col("__s")).as("__l"))
    val lLong = lLen.filter(col("__l") >= n)
    val rLong = rLen.filter(col("__l") >= n)

    def st(i: String, l: String) = s"(($i * $l + ${n - 1}) div $n)"
    def segLen(i: String, l: String) =
      s"(${st(s"($i + 1)", l)} - ${st(i, l)})"

    val segArr =
      s"""transform(sequence(0, $k), i ->
         |  substring(__s, ${st("i", "__l")} + 1, ${segLen("i", "__l")}))"""
        .stripMargin
    val build = lLong.select(col("__id"), col("__l"), col("__s"),
      posexplode(expr(segArr))).toDF("__id", "__l", "__sa", "__i", "__seg")

    val lenFilter = {
      val ls = lLong.select(col("__l")).distinct().limit(65)
        .collect().map(_.getInt(0))
      if (ls.length <= 64 && ls.nonEmpty)
        s"filter(sequence(greatest(__l - $k, $n), __l + $k), " +
          s"l1 -> l1 IN (${ls.sorted.mkString(",")}))"
      else s"sequence(greatest(__l - $k, $n), __l + $k)"
    }
    val probeArr =
      s"""flatten(flatten(transform(sequence(0, $k), i ->
         |  transform($lenFilter, l1 ->
         |    filter(transform(sequence(${st("i", "l1")} + 1 - $k,
         |                              ${st("i", "l1")} + 1 + $k), q ->
         |      CASE WHEN q >= 1
         |             AND q + ${segLen("i", "l1")} - 1 <= __l
         |           THEN named_struct('i', i, 'l1', l1,
         |             'seg', substring(__s, q, ${segLen("i", "l1")}))
         |      END), x -> x IS NOT NULL)))))""".stripMargin
    val probe = rLong
      .select(col("__id"), col("__s").as("__sb"),
        explode(array_distinct(expr(probeArr))).as("__p"))
      .select(col("__id"), col("__sb"), col("__p.i").as("__i"),
        col("__p.l1").as("__l1"), col("__p.seg").as("__seg"))

    val longPairs = build.as("ba")
      .join(probe.as("pb"),
        col("ba.__i") === col("pb.__i") &&
          col("ba.__l") === col("pb.__l1") &&
          col("ba.__seg") === col("pb.__seg"))
      .select(col("ba.__id").as("left_id"), col("pb.__id").as("right_id"),
        levenshtein(col("__sa"), col("__sb"), k).as("dist"))
      .filter(col("dist") >= 0)
      .distinct()

    // value paths: either side may be too short to pigeonhole. Band
    // equi-join as in selfJoin; orientation is fixed by which table a
    // value came from, so no symmetrizing swap — run both directions.
    def vals(df: DataFrame, maxLenExcl: Int) =
      df.filter(col("__l") < maxLenExcl)
        .select(col("__s"), col("__l")).distinct()
    def banded(short: DataFrame, near: DataFrame) = short
      .select(col("__s"),
        explode(sequence(greatest(col("__l") - k, lit(0)),
          col("__l") + k)).as("__lb"))
      .as("va")
      .join(near.as("vb"), col("va.__lb") === col("vb.__l"))
      .select(col("va.__s").as("__shorts"), col("vb.__s").as("__nears"))
    val p1 = banded(vals(lLen, n), vals(rLen, n + k))
      .select(col("__shorts").as("__ls"), col("__nears").as("__rs"))
    val p2 = banded(vals(rLen, n), vals(lLen, n + k))
      .select(col("__nears").as("__ls"), col("__shorts").as("__rs"))
    val valPairs = p1.union(p2).distinct()
      .withColumn("dist", levenshtein(col("__ls"), col("__rs")))
      .filter(col("dist") <= k)
    val shortPairs = valPairs
      .join(lLen.select(col("__id"), col("__s")).as("ia"),
        col("__ls") === col("ia.__s"))
      .join(rLen.select(col("__id"), col("__s")).as("ib"),
        col("__rs") === col("ib.__s"))
      .select(col("ia.__id").as("left_id"), col("ib.__id").as("right_id"),
        col("dist"))
      .distinct()

    // long path needs BOTH sides >= n; value paths cover either side
    // < n (a pair with one side >= n+k and the other < n is > k edits
    // by length alone) — disjoint, so plain union
    longPairs.union(shortPairs)
      .select(col("left_id"), col("right_id"),
        col("dist").cast("int").as("dist"))
  }
}
