package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Join-side reduction operators for 100 TB fact-to-dimension joins.
  *
  * The reference's serving joins (dbt_modeling/models/serving_layer sql models
  * — fact_session joined to dim_songs/dim_artists/dim_users) are
  * fact × filtered-dimension shapes. At scale the dominant cost is
  * shuffling the FACT side; when the dimension is selective, most fact
  * rows shuffle only to be dropped by the join. Bloom pruning removes
  * them before the exchange.
  */
object Joins {

  /** Filter `large` down to rows whose `largeKey` PROBABLY appears in
    * `small`'s `smallKey` — a Bloom-filter semi-join reduction. The
    * result is a superset of the true semi-join (false-positive rate
    * `fpp`), so composing with the real join afterwards is exact; what
    * the filter buys is that the dropped fraction never reaches the
    * join's shuffle.
    *
    * Mechanics: both sides hash the key to int64 with codegen'd
    * xxhash64 (type-uniform probes); the small side aggregates into a
    * Bloom filter merged on the driver (size is bounded by
    * `expectedItems`/`fpp` — 1M items at 1% ≈ 1.2 MB, independent of
    * the large side), which ships to executors as a literal inside the
    * native [[BloomFilterMightContain]] expression — the same
    * expression Spark's AQE runtime row-level filtering injects, so
    * the probe stays inside whole-stage codegen. Null keys are dropped
    * (equi-join semantics: null never matches).
    *
    * Use when the dimension is data-dependent (can't be a static
    * partition filter) but selective; for tiny dimensions prefer a
    * broadcast join outright. */
  def bloomPrune(large: DataFrame, largeKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // xxhash64 hashes by PHYSICAL type: int 5 and bigint 5 produce
    // different hashes, so mismatched key types would make every probe
    // miss and silently prune rows the real join (which coerces types)
    // would keep. Align both sides to the type the join's own BINARY
    // COMPARISON coercion picks (string-vs-bigint compares as DOUBLE,
    // not STRING — the "wider" type would hash join-equal values
    // apart); refuse key pairs the join itself couldn't compare.
    val largeT = large.schema(largeKey).dataType
    val smallT = small.schema(smallKey).dataType
    val commonT = GraftSqlShims.joinKeyCommonType(largeT, smallT).getOrElse(
      throw new IllegalArgumentException(
        s"bloomPrune: no common type for $largeKey:$largeT vs $smallKey:$smallT"))
    val bf = small.filter(col(smallKey).isNotNull)
      .select(xxhash64(col(smallKey).cast(commonT)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val probe = GraftSqlShims.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      GraftSqlShims.expression(xxhash64(col(largeKey).cast(commonT)))))
    large.filter(col(largeKey).isNotNull && probe)
  }

  /** Inner join with the large side Bloom-pruned first: exactly equal
    * to `large.join(small, largeKey === smallKey)` (the join clears
    * the Bloom filter's false positives), but the large side's shuffle
    * carries only rows that can match. The honest scale contract: with
    * a selective dimension this cuts the dominant exchange by the
    * dimension's selectivity; with an unselective one it costs one
    * extra scan-side filter probe per row (~ns, codegen). */
  def bloomPrunedJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val pruned = bloomPrune(large, largeKey, small, smallKey,
      expectedItems, fpp)
    pruned.join(small, pruned(largeKey) === small(smallKey))
  }

  /** Inner equi-join of a skew-keyed fact against a dimension too big
    * (or a join shape unable — shuffle-hash, aggregate-feeding) to
    * broadcast: result is EXACTLY `fact ⋈ dim on factKey = dimKey`,
    * but no single reducer ever owns a hot key's full row set.
    *
    * Differential salting, not blanket salting: a map-side-combined
    * count finds the keys with ≥ `hotThreshold` fact rows (the partial
    * aggregation means the hot key never concentrates during
    * detection — each task emits one (key, partial-count) row). Cold
    * keys take the plain join untouched. Hot fact rows get a per-row
    * salt in [0, saltBuckets) and ONLY the hot dimension rows are
    * replicated once per salt, so the hot key's rows spread over
    * `saltBuckets` reducers and the replication cost is
    * |hot keys| × saltBuckets — never |dim| × saltBuckets, which is
    * what makes blanket salting unusable at 100 TB.
    *
    * The three hot-key probes (fact anti, fact semi, dim semi) are
    * broadcasts of the SAME aggregation subplan — Spark's
    * ReuseExchange collapses them into one physical build. That
    * single-build property DEPENDS on `spark.sql.exchange.reuse`
    * (default true): with it disabled the detection aggregation over
    * the full fact executes once per probe — still correct, 3× the
    * detection cost. Pinning such a configuration? Materialize the
    * hot frame first (persist/localCheckpoint) and pass a wrapper, or
    * accept the re-computation. The salt
    * is [[Skew.contentSalt]] — a hash of the whole fact row — NEVER
    * monotonically_increasing_id/rand: a recomputed shuffle map task
    * must re-salt each row identically or the stage goes
    * indeterminate on fetch-failure retry (see Skew.scala's rationale;
    * the known tradeoff — byte-identical hot-key rows sharing a
    * salt — is documented there too).
    *
    * [[Skew.saltedJoin]] is the blanket-salting sibling (replicates
    * the ENTIRE other side — right when it is small); AQE's skew-join
    * rule solves the sort-merge case at runtime; this operator is for
    * the remaining shapes — big dims, hash joins, skew feeding a
    * downstream grouped aggregation, or a pinned non-AQE plan. */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, saltBuckets: Int = 16,
      hotThreshold: Long = 2000000L): DataFrame = {
    require(saltBuckets > 1, s"saltBuckets must be > 1: $saltBuckets")
    require(hotThreshold > 0, s"hotThreshold must be > 0: $hotThreshold")
    val reserved = Seq("__hot_key", "__salt")
    require(!(fact.columns ++ dim.columns).exists(reserved.contains),
      s"saltedJoin reserves columns $reserved")
    val hot = fact.filter(fact(factKey).isNotNull)
      .groupBy(fact(factKey).as("__hot_key"))
      .agg(count(lit(1)).as("__hot_count"))
      .filter(col("__hot_count") >= hotThreshold)
      .select(col("__hot_key"))
    // every key reference below resolves through its own DataFrame
    // (fact(...)/dim(...)/coldFact(...)) so factKey == dimKey — the
    // common equi-join spelling — never trips ambiguous-reference
    val coldFact = fact
      .join(broadcast(hot), fact(factKey) === hot("__hot_key"), "left_anti")
    val cold = coldFact.join(dim, coldFact(factKey) === dim(dimKey))
    val saltedFact = fact
      .join(broadcast(hot), fact(factKey) === hot("__hot_key"), "left_semi")
      .withColumn("__salt", Skew.contentSalt(fact, saltBuckets).cast("int"))
    val saltedDim = dim
      .join(broadcast(hot), dim(dimKey) === hot("__hot_key"), "left_semi")
      .withColumn("__salt",
        explode(array((0 until saltBuckets).map(lit(_)): _*)))
    val hotJoined = saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
    // positional union: both branches emit fact-columns ++ dim-columns
    // in input order, and — like the plain join this operator replaces
    // bit-for-bit — duplicated column NAMES across the two sides are
    // legal output (unionByName would reject them)
    cold.union(hotJoined)
  }

  /** Range-lookup join without a nested loop: each fact row finds the
    * dim rows whose `[loCol, hiCol]` interval (inclusive) contains its
    * `valueCol`. The naive `value BETWEEN lo AND hi` join has no
    * equi-key, so Spark plans a BroadcastNestedLoopJoin — every fact
    * row probes EVERY dim row, O(|fact|·|dim|). Here both sides bin to
    * `floor(x / binWidth)`: the dim explodes one row per covered bin
    * (bounded by interval span / binWidth), the fact maps to exactly
    * one bin, and the join is a plain equi-join on the bin key with
    * the range predicate as a residual filter — Catalyst broadcasts a
    * small dim or shuffles both sides on the bin, and either way the
    * per-row probe set is one bin's worth of intervals, not the whole
    * dim. Size `binWidth` near the typical interval width: wider bins
    * fewer dim replicas but more residual-filter misses.
    *
    * Same row multiset as the naive join (overlapping intervals emit
    * one row per matching interval). Binning divides in doubles, so
    * values are binned exactly for |x| < 2^53 — every practical id /
    * timestamp-micros / measure domain; beyond that pre-scale the
    * column. */
  def rangeLookupJoin(fact: DataFrame, valueCol: String,
      dim: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // an inverted interval (lo > hi) matches nothing under BETWEEN —
    // drop it BEFORE sequence(), which would otherwise count DOWN and
    // fabricate bins
    val binnedDim = dim.filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth.toDouble),
          floor(col(hiCol) / binWidth.toDouble))))
    val binnedFact = fact.withColumn("__bin",
      floor(col(valueCol) / binWidth.toDouble))
    binnedFact.join(binnedDim, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) &&
        col(valueCol) <= col(hiCol))
      .drop("__bin")
  }

  /** EXACT inner-equi-join cardinality WITHOUT running the join:
    * |L ⋈ R| = Σ over matching keys of cL(k)·cR(k), computed from the
    * two per-key count aggregates. The pre-flight for 100 TB join
    * safety — a fact⋈fact join on a low-selectivity key can multiply
    * (every pipeline has a war story of a "join" that emitted 10¹²
    * rows); this costs two count aggregations plus a distinct-key-
    * sized join, predicts the output EXACTLY (not a histogram
    * estimate), and lets the caller gate: run the join, salt it, or
    * refuse. Also returns the top contributing keys — the skew
    * diagnosis (which keys to salt or drop) in the same pass.
    *
    * Returns one row: (join_rows, left_rows, right_rows,
    * matching_keys, max_key_product, blowup_x1000) where blowup is
    * join_rows·1000 / max(left_rows, right_rows) as an exact integer
    * ratio (1000 = one output row per larger-side input row).
    *
    * Scale shape: per-key counts are map-side-combined aggregations
    * (shuffle = distinct keys, not rows); the count join is
    * distinct×distinct; everything reduces to ONE row. Products and
    * sums are exact BIGINTs — ANSI overflow on a genuinely ≥2^63
    * prediction is a loud failure, which for a pre-flight is the
    * right answer ("do not run this join"). */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val cl = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__cl"))
    val cr = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cr"))
    val lt = left.agg(count(lit(1)).as("__lt"))
    val rt = right.agg(count(lit(1)).as("__rt"))
    cl.join(cr, "__k")
      .agg(coalesce(sum(col("__cl") * col("__cr")), lit(0L))
          .as("join_rows"),
        count(lit(1)).as("matching_keys"),
        coalesce(max(col("__cl") * col("__cr")), lit(0L))
          .as("max_key_product"))
      .crossJoin(broadcast(lt)).crossJoin(broadcast(rt))
      .select(col("join_rows"), col("__lt").as("left_rows"),
        col("__rt").as("right_rows"), col("matching_keys"),
        col("max_key_product"))
      // `div`, not `/`: Spark's `/` promotes to DOUBLE; the ratio
      // must stay an exact integer
      .withColumn("blowup_x1000", expr(
        "join_rows * 1000L div greatest(left_rows, right_rows, 1L)"))
  }
}
