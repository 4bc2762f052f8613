package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training-data curation.
  *
  * Random sampling (`df.sample`) is seed × partitioning dependent — a
  * repartition or a retry changes the sample, which is unacceptable for
  * reproducible train/eval splits. These operators derive membership
  * from a content hash of a stable id, so the assignment is a pure
  * function of the data: same row → same bucket on any cluster, any
  * partitioning, any engine. The hash is the base-31 polynomial mod
  * 1e9+7 (cross-engine reproducible in plain SQL — no engine-specific
  * hash builtin), evaluated per row in a narrow map.
  */
object Sampling {

  /** Base-31 polynomial hash of the string form of `id`, mod 1e9+7 —
    * portable integer arithmetic (reproducible in plain SQL on any
    * engine). */
  def contentHash(id: Column): Column =
    aggregate(split(id.cast("string"), ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** Stable bucket in [0, buckets) from the string form of `id`. */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    pmod(contentHash(id), lit(buckets.toLong))
  }

  /** Keep ~pct% of rows, deterministically (bucket < pct of 100). */
  def deterministicSample(df: DataFrame, idCol: String,
      pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.filter(hashBucket(col(idCol), 100) < pct)
  }

  /** Add a `split` column: "train" for ~trainPct% of rows, "eval"
    * otherwise. Stable across reruns, repartitions, and engines —
    * a row never migrates between splits. */
  def splitByHash(df: DataFrame, idCol: String,
      trainPct: Int = 90): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    df.withColumn("split",
      when(hashBucket(col(idCol), 100) < trainPct, lit("train"))
        .otherwise(lit("eval")))
  }

  /** K-fold cross-validation assignment: a `fold` column in
    * [0, k) hashed from the row id — stable across reruns,
    * repartitions, and engines, so every CV round trains and
    * evaluates on exactly the same rows everywhere. Fold f's eval set
    * is `fold === f`, its train set everything else; a narrow map
    * like every split here (no shuffle — the assignment is a pure
    * function of the id). */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kFold needs k >= 2, got $k")
    df.withColumn("fold", hashBucket(col(idCol), k).cast("int"))
  }

  /** Leakage-safe split: assignment is hashed from `groupCol` (a
    * dedup cluster label, a source domain, a user id) instead of the
    * row id, so every member of a group lands in the SAME split. This
    * is the train/test-contamination guard for near-duplicates: with
    * per-row splitting, two near-dup documents can straddle the
    * train/eval boundary and leak; hashing the [[graft.dedup.Dedup
    * .connectedComponents]] cluster label keeps whole duplicate
    * clusters together. Same narrow-map scale shape as
    * [[splitByHash]]. */
  def splitByGroup(df: DataFrame, groupCol: String,
      trainPct: Int = 90): DataFrame =
    splitByHash(df, groupCol, trainPct) // same mechanism, keyed on the group

  /** Result of [[groupScan]]: a SKINNY frame — (idCol, groupCol,
    * `__gsw` weight, prefix) only, one row per input row — plus the
    * tiny per-group totals frame (one row per group — reuse it
    * instead of re-scanning the corpus for group counts). Callers
    * filter the skinny frame to the selected ids and join BACK to the
    * full rows: document bytes never enter the rank shuffles, and
    * when the selection is small AQE broadcasts it, so the join-back
    * costs no corpus shuffle at all. */
  private[graft] final case class GroupScan(ranked: DataFrame,
      totals: DataFrame)

  /** Exact per-group ordered prefix scan (rank when `weight` is 1,
    * running sum otherwise) WITHOUT a per-group window — the
    * distributed two-phase rank of [[assignBalancedShards]]
    * generalized to per-GROUP order. `Window.partitionBy(group)` makes
    * a dominant group ONE task (AQE splits skewed joins/aggregations,
    * never window partitions), so a 90%-whale language stratum turns
    * an exact quota into a single-task sort of most of the corpus.
    * Here instead:
    *
    *  1. range-partition on (group, contentHash(id), id) — every
    *     partition holds a contiguous slice of the global group+order
    *     key space, so a whale group spans MANY partitions, each a
    *     balanced ~corpus/P slice; stamp `spark_partition_id()` and
    *     materialize once (the side jobs below must observe the same
    *     partition ids AQE planned);
    *  2. aggregate per-(partition, group) weight sums — a frame of at
    *     most P + groups − 1 rows (groups are range-contiguous), NOT
    *     corpus-sized; its per-group prefix window is over ≤P rows per
    *     group, and it broadcasts back (never a collect, unlike
    *     [[assignBalancedShards]]'s driver offsets);
    *  3. per-(partition, group) local prefix window + broadcast
    *     offset = the exact global per-group prefix. The window key
    *     includes the partition id, so no window partition ever
    *     exceeds one range-slice — flat tasks regardless of skew.
    *
    * Both exchanges (range + the window's hash on (pid, group)) move
    * only the SKINNY projection — (id, group, weight, hash), tens of
    * bytes per row regardless of document size — and the
    * materialized-once frame is that projection too, so the cache
    * footprint is rank-state, never corpus bytes. Balanced at any
    * group distribution. The prefix arithmetic is exact (integer
    * weights), so output is bit-identical to the single-window form
    * on any cluster, partitioning, or engine. Ordering is always
    * (contentHash(id) asc, id asc) — the portable deterministic order
    * every sampler here uses; ids are assumed unique and non-null
    * (the precondition every deterministic operator in this module
    * already carries). */
  private[graft] def groupScan(df: DataFrame, groupCol: String,
      idCol: String, weight: Column, outName: String): GroupScan = {
    Seq("__gsw", "__gsh").foreach { c =>
      require(!df.columns.contains(c),
        s"groupScan reserves the column name $c")
    }
    val skinny = df.select(col(idCol), col(groupCol),
      weight.cast("long").as("__gsw"),
      contentHash(col(idCol)).as("__gsh"))
    prefixCore(skinny, groupCol, idCol,
      Seq(col("__gsh").asc, col(idCol).asc), col("__gsw"), outName)
  }

  /** The shared two-phase engine behind [[groupScan]], [[groupTopK]]
    * and [[groupTopQuota]]: exact per-group ordered prefix sums of
    * `weight` over an already-projected skinny frame, under an
    * arbitrary deterministic total order `ord` (callers append the id
    * tiebreak). See [[groupScan]] for the full scale rationale. */
  private def prefixCore(skinny: DataFrame, groupCol: String,
      idCol: String, ord: Seq[Column], weight: Column,
      outName: String): GroupScan = {
    import org.apache.spark.sql.expressions.Window
    Seq("__pid", "__gsp", "__gsg", "__gso", outName).foreach { c =>
      require(!skinny.columns.contains(c),
        s"prefixCore reserves the column name $c")
    }
    val stamped = graft.dedup.Dedup.persistEager(skinny
      .repartitionByRange(col(groupCol).asc +: ord: _*)
      .withColumn("__pid", spark_partition_id()))
    // ≤ P + groups − 1 rows; materialized so the offsets window, the
    // totals, and every caller-side consumer of totals read it instead
    // of re-aggregating the cached corpus per consumer
    val parts = graft.dedup.Dedup.persistEager(stamped
      .groupBy(col("__pid").as("__gsp"), col(groupCol).as("__gsg"))
      .agg(sum(weight).as("__gw")))
    val byG = Window.partitionBy(col("__gsg"))
    // per-group weight mass in STRICTLY EARLIER partitions — the
    // offset that turns a local prefix into the global one; the window
    // runs over the tiny parts frame (≤ P rows per group)
    val offs = parts.select(col("__gsp"), col("__gsg"),
      coalesce(sum(col("__gw")).over(byG.orderBy(col("__gsp").asc)
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("__gso"))
    val totals = parts.groupBy(col("__gsg").as(groupCol))
      .agg(sum(col("__gw")).as("__total"))
    val local = sum(weight).over(
      Window.partitionBy(col("__pid"), col(groupCol))
        .orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val ranked = stamped
      .join(broadcast(offs),
        col("__pid") === col("__gsp") && (col(groupCol) <=> col("__gsg")))
      .withColumn(outName, local + col("__gso"))
      .select(skinny.columns.map(col).toIndexedSeq :+ col(outName): _*)
    GroupScan(ranked, totals)
  }

  /** (column name, descending?) orderings for the rank operators
    * below, materialized into the skinny rank frame. The id tiebreak
    * is always appended, so any ordering is a deterministic total
    * order. */
  private def rankScan(df: DataFrame, groupCol: String, idCol: String,
      orderBy: Seq[(String, Boolean)], rankName: String): GroupScan = {
    require(orderBy.nonEmpty, "orderBy must name at least one column")
    val keep = (Seq(idCol, groupCol) ++ orderBy.map(_._1)).distinct
    val ord = orderBy.map { case (n, desc) =>
      if (desc) col(n).desc else col(n).asc } :+ col(idCol).asc
    prefixCore(df.select(keep.map(col): _*), groupCol, idCol, ord,
      lit(1L), rankName)
  }

  /** Exact top-k per group under an arbitrary (column, descending?)
    * order — `SELECT *, row_number() OVER (PARTITION BY g ORDER BY …)
    * AS rank … WHERE rank <= k` without the per-group window. Use
    * this when the group key is LOW-cardinality or skewed (languages,
    * sources, domains): a whale group spans many balanced range
    * slices instead of becoming one sort task. For high-cardinality
    * balanced keys (per-customer top orders) the plain window IS the
    * right plan — millions of small partitions parallelize fine and
    * skip this operator's join-back. Rank ties always break by id
    * ascending, so the selection is deterministic on any engine. */
  def groupTopK(df: DataFrame, groupCol: String, idCol: String,
      orderBy: Seq[(String, Boolean)], k: Int,
      rankName: String = "rank"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val sel = rankScan(df, groupCol, idCol, orderBy, rankName)
      .ranked.filter(col(rankName) <= k)
    joinBack(df, idCol, sel, Seq(rankName))
  }

  /** [[groupTopK]] with PER-GROUP quotas: `quotas` is one row per
    * group value carrying `quotaCol` (broadcast — group cardinality
    * sized, never corpus sized). Groups absent from `quotas` are
    * dropped, mirroring [[mixToTokenBudget]]'s weight semantics. The
    * shape behind per-language keep-quotas (lang rebalancing) and any
    * "rank within group, cut at a group-dependent threshold" rule. */
  def groupTopQuota(df: DataFrame, groupCol: String, idCol: String,
      orderBy: Seq[(String, Boolean)], quotas: DataFrame,
      quotaCol: String, rankName: String = "rank"): DataFrame = {
    val q = quotas.select(col(groupCol).as("__g"),
      col(quotaCol).as("__q"))
    val sel = rankScan(df, groupCol, idCol, orderBy, rankName)
      .ranked
      .join(broadcast(q), col(groupCol) <=> col("__g"))
      .filter(col(rankName) <= col("__q"))
    joinBack(df, idCol, sel, Seq(rankName))
  }

  /** Join a filtered [[GroupScan]] selection back onto the full rows
    * by id, restoring `df`'s exact column order plus `extra`. Inner
    * join on the unique id: when the selection is small AQE broadcasts
    * it and the corpus never shuffles. */
  private def joinBack(df: DataFrame, idCol: String,
      selected: DataFrame, extra: Seq[String]): DataFrame =
    df.join(selected.select((idCol +: extra).map(col): _*), Seq(idCol))
      .select((df.columns.toSeq ++ extra).map(col): _*)

  /** Temperature-based group sampling (the mT5/XLM-R α-sampling
    * mixture rule): draw `n_g ∝ c_g^α` documents per group, so
    * low-resource languages are UP-weighted relative to proportional
    * sampling (α = 1 is proportional, α → 0 is uniform; 0.5 is the
    * common pretraining default and the only α this implementation
    * accepts cross-engine-exactly — c^0.5 is IEEE `sqrt`, a
    * CORRECTLY-ROUNDED operation everywhere, where `pow` is not).
    * The allocation is integer-exact: each weight quantizes to
    * micro-units `q_g = floor(sqrt(c_g)·10⁶)` (sqrt, ×, floor — all
    * correctly rounded), base `n_g = min(c_g, (total·q_g) div Σq)`,
    * then the floor shortfall `total − Σn_g` is distributed one seat
    * each to the uncapped groups with the largest division remainders
    * (ties by group value ascending, NULL last) — the
    * largest-remainder / Hamilton apportionment rule in the same pure
    * integer arithmetic, so the same counts give the same allocation
    * in any engine at any parallelism. The draw is exactly `total`
    * rows whenever no group's cap binds (and Σc_g ≥ total); binding
    * caps can still leave a shortfall — a capped group cannot donate
    * its seat in this single-pass rule, which is the documented trade
    * against an iterative respill. Selection within a group is by
    * portable content-hash rank, ties by id.
    *
    * Scale shape: the [[groupScan]] two-phase distributed rank (no
    * per-group single-task window — a 90%-whale language stays flat),
    * whose tiny per-group totals feed the allocation broadcast — the
    * corpus is scanned ONCE. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      total: Long): DataFrame = {
    require(total > 0, s"total must be > 0, got $total")
    val scan = groupScan(df, groupCol, idCol, lit(1L), "__rn")
    val counts = scan.totals
      .withColumn("__q",
        floor(sqrt(col("__total").cast("double")) * 1e6).cast("long"))
    val tot = counts.agg(sum(col("__q")).as("__sq"))
    // allocation in DECIMAL(38,0): total·q_g overflows BIGINT once
    // total and a group's micro-unit weight are both large (2e9 docs
    // requested × a 2.5e10-doc group ⇒ ~3e20), and a wrapped-negative
    // product would silently empty every big group; 38 digits hold
    // any realistic product exactly and `div` stays integral.
    // Everything below runs on the groups-row counts frame — tiny, so
    // its unpartitioned rank window is free
    val based = counts.crossJoin(broadcast(tot))
      .select(col(groupCol).as("__g"), col("__total"),
        least(col("__total"),
          expr(s"(CAST($total AS DECIMAL(38,0)) * __q) div __sq"))
          .cast("long").as("__base"),
        expr(s"(CAST($total AS DECIMAL(38,0)) * __q) % __sq")
          .as("__rem"))
    val spent = based.agg(sum(col("__base")).as("__sb"))
    // largest-remainder seats: rank UNCAPPED groups by remainder
    // (partitioning on the eligibility flag keeps capped groups out
    // of the seat order instead of absorbing seats they cannot take)
    val rkW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__base") < col("__total"))
      .orderBy(col("__rem").desc, col("__g").asc_nulls_last)
    val alloc = based.crossJoin(broadcast(spent))
      .withColumn("__rk", row_number().over(rkW))
      .select(col("__g"),
        (col("__base") + when(col("__base") < col("__total") &&
          col("__rk") <= lit(total) - col("__sb"), 1L).otherwise(0L))
          .as("__n"))
    // null-safe join: a NULL group key is a legitimate stratum (the
    // undetected-language slice) — it must receive its allocation
    // like any other group, not silently vanish while its weight
    // still sits in the Σq denominator (stratifiedSample samples the
    // NULL stratum too; the two must agree)
    val sel = scan.ranked.join(broadcast(alloc), col(groupCol) <=> col("__g"))
      .filter(col("__rn") <= col("__n"))
    joinBack(df, idCol, sel, Nil)
  }

  /** EXACT per-stratum quota sample: within each `stratumCol` value,
    * keep exactly ceil(frac × stratum size) rows — the corpus-balancing
    * operator (per-language / per-source quotas for training mixes).
    * Row selection orders each stratum by the content hash (then id),
    * so which rows survive is a pure function of the data: same result
    * on any cluster, partitioning, or engine.
    *
    * Scale shape: [[groupScan]]'s two-phase distributed rank — exact
    * quotas at ANY stratum skew (a whale language spans many balanced
    * range slices instead of one window task), stratum sizes ride the
    * scan's tiny totals frame broadcast back (no second corpus
    * aggregate). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0)
    val scan = groupScan(df, stratumCol, idCol, lit(1L), "__rn")
    val sizes = scan.totals
      .select(col(stratumCol).as("__g"), col("__total").as("__n"))
    val sel = scan.ranked.join(broadcast(sizes), col(stratumCol) <=> col("__g"))
      .filter(col("__rn") <= ceil(lit(frac) * col("__n")))
    joinBack(df, idCol, sel, Nil)
  }

  /** Weighted TOKEN-budget mixture — the data-mixing step before
    * training: each group (language, source, domain) contributes
    * documents in deterministic content-hash order until its share
    * of the total token budget (`weights(g) · totalTokens`) is
    * reached; the document crossing the boundary is included (greedy
    * take, standard mixture semantics), groups without a weight are
    * dropped. Sampling by TOKENS, not documents — a mixture spec of
    * 60/25/15 means token mass, and per-doc token counts vary wildly
    * across languages.
    *
    * Deterministic (same portable hash as [[splitByHash]], DuckDB-
    * replayable) and reproducible on any cluster. Scale shape: one
    * broadcast of the weight table (unweighted groups are dropped
    * BEFORE the scan, so they cost nothing), then [[groupScan]]'s
    * two-phase distributed running sum — the greedy take stays exact
    * at any group skew with no single-task window. Token counts must
    * be an integral type: the split prefix sum (local + offset) is
    * only order-independent, hence bit-reproducible, in integer
    * arithmetic. */
  def mixToTokenBudget(df: DataFrame, idCol: String, groupCol: String,
      tokensCol: String, weights: Map[String, Double],
      totalTokens: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0),
      "weights must be non-negative")
    require(totalTokens > 0)
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(tokensCol).dataType)
    }, s"mixToTokenBudget needs an integral token count column, got " +
      df.schema(tokensCol).dataType.simpleString)
    val spark = df.sparkSession
    import spark.implicits._
    val targets = weights.toSeq.toDF(groupCol, "__wt")
      .select(col(groupCol),
        (col("__wt") * totalTokens).cast("long").as("__target"))
    // unweighted groups drop at this join — they never enter the scan
    val weighted = df.join(broadcast(targets), Seq(groupCol))
    val sel = groupScan(weighted, groupCol, idCol, col(tokensCol),
        "running_tokens")
      .ranked
      .join(broadcast(targets), Seq(groupCol))
      .filter(col("running_tokens") - col("__gsw") < col("__target"))
    joinBack(df, idCol, sel, Seq("running_tokens"))
  }

  /** Hashed-n-gram importance resampling (the DSIR shape, Xie et al.
    * 2023, public literature): re-weight a raw corpus toward a target
    * domain using hashed bigram features, then keep the top-k
    * highest-importance documents. Per bucket `b` of `buckets` hashed
    * word-bigram slots, the importance weight is the smoothed
    * target/raw frequency ratio; a document's score is the sum of its
    * bigram weights (with multiplicity), so documents whose n-gram
    * profile looks like the target domain rise to the top.
    *
    * Deviating from the paper's float log-ratios on purpose: weights
    * are integer-quantized —
    * `w(b) = ((tgt_b+1) · 10^6 · tot_raw) div ((raw_b+1) · tot_tgt)`
    * — pure BIGINT arithmetic, so scores are EXACTLY reproducible on
    * any engine/cluster/partitioning (log-based weights differ by
    * ULPs across libm implementations; ranking near ties would then
    * be engine-dependent). The quantization only rescales the ratio
    * (monotone), so the ranking it induces is the paper's. Overflow
    * bound: `(tgt_b+1)·10^6·tot_raw < 2^63` holds while
    * `tgt_b·tot_raw < 9·10^12` — estimate distributions from a
    * sampled target/raw slice beyond that, as the paper itself does.
    *
    * Scale shape: one narrow map explodes bigrams; ONE aggregation
    * builds the `buckets`-row weight table (counts raw and target in
    * the same pass — the target is a flag, not a second scan); totals
    * ride a 1-row broadcast cross join (never a collect); scoring is
    * a broadcast join of the weight table back onto the bigram stream
    * + one sum per document; top-k is TakeOrderedAndProject
    * (per-partition top-k, then a k-row merge — no global sort
    * materializes). Ties break by id, so the cut is deterministic. */
  def dsirResample(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256, k: Int = 100): DataFrame = {
    require(buckets > 0 && k > 0,
      s"dsirResample needs buckets > 0 and k > 0, got $buckets, $k")
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val base = df
      .select(col(idCol).as("id"), isTarget.as("is_tgt"), toks.as("w"))
      .filter(size(col("w")) >= 2)
    val bigrams = zip_with(
      slice(col("w"), lit(1), size(col("w")) - 1),
      slice(col("w"), lit(2), size(col("w")) - 1),
      (a, b) => concat(a, lit(" "), b))
    // consumed twice (weight estimation + scoring) — one materialization
    val feat = graft.dedup.Dedup.persistEager(
      base.select(col("id"), col("is_tgt"),
        explode(bigrams).as("bg"))
        .select(col("id"), col("is_tgt"),
          pmod(contentHash(col("bg")), lit(buckets.toLong)).as("b")))
    val counts = feat.groupBy("b").agg(
      count(lit(1)).as("raw_cnt"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_cnt"))
    val tots = counts.agg(sum("raw_cnt").as("tot_r"),
      sum("tgt_cnt").as("tot_t"))
    val weights = counts.crossJoin(broadcast(tots))
      .select(col("b"),
        expr("((tgt_cnt + 1L) * 1000000L * tot_r)" +
          " div ((raw_cnt + 1L) * tot_t)").as("w"))
    feat.join(broadcast(weights), "b")
      .groupBy("id").agg(sum("w").as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Assign every row to one of `nShards` weight-balanced shards — the
    * final step before writing training data as N files whose token
    * counts must be near-equal (a skewed shard becomes the straggler
    * of every epoch). Serpentine (boustrophedon) assignment: rank rows
    * by weight descending (ties by id — fully deterministic), then
    * deal rank r to shard `r % 2n < n ? r % n : n-1 - r % n`, i.e.
    * 0..n-1 then n-1..0, so each round of 2n rows gives every shard
    * one heavy and one light row of that round. For any weight
    * distribution the shard totals differ by at most the largest
    * weight in the corpus — the greedy-LPT guarantee shape without
    * LPT's sequential state.
    *
    * Scale shape — exact DISTRIBUTED ranking, no global window: the
    * rows are range-partitioned on (weight desc, id asc), so every
    * partition holds a contiguous rank interval; the global rank of a
    * row is then its per-partition row_number plus the total count of
    * the partitions before it. Those counts are one
    * numPartitions-row collect (bounded by the shuffle-partition
    * setting, never by the corpus) broadcast back as offsets. Two
    * narrow shuffles (range exchange + the per-partition window's
    * hash exchange on the stamped partition id), each ~corpus-sized,
    * and NO single-partition stage — at 10^10 rows the sort is 32k
    * tasks of ~300k rows, not one task sorting the world. The stamped
    * frame is materialized once (the offsets job and the output job
    * must see identical partition ids). Rank arithmetic is exact, so
    * the output is bit-identical to the single-window form on any
    * cluster, any partitioning, any engine. */
  def assignBalancedShards(df: DataFrame, idCol: String,
      weightCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    require(!df.columns.contains("__pid"),
      "assignBalancedShards reserves the column name __pid")
    // range partitioning puts rank-contiguous runs in each partition;
    // materialize ONCE so the offsets job and the output job agree on
    // partition ids (AQE may otherwise re-plan between jobs)
    val stamped = graft.dedup.Dedup.persistEager(
      df.repartitionByRange(col(weightCol).desc, col(idCol).asc)
        .withColumn("__pid", spark_partition_id()))
    // cumulative row counts of the partitions BEFORE each pid — a
    // numPartitions-row collect, independent of corpus size
    val counts = stamped.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2))
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__off")
    val local = row_number().over(
      Window.partitionBy(col("__pid"))
        .orderBy(col(weightCol).desc, col(idCol).asc)).cast("long") - 1
    val r = local + col("__off")
    val phase = r % (2L * nShards)
    stamped.join(broadcast(offDf), Seq("__pid"))
      .withColumn("shard",
        when(phase < nShards, phase)
          .otherwise(lit(2L * nShards - 1) - phase).cast("int"))
      .select(df.columns.map(col).toIndexedSeq :+ col("shard"): _*)
  }

  /** Weighted priority sampling (the deterministic form of
    * Duffield/Lund/Thorup priority sampling, JACM'07, public
    * literature): each row gets priority
    * `w / u` where `u ∈ (0, 1]` derives from the portable content
    * hash of the id, and the k highest priorities are the sample —
    * so heavy rows are proportionally likelier to be kept, but
    * membership is a pure function of the data (same corpus → same
    * sample on any cluster, any partitioning, any engine; the classic
    * scheme's fresh randomness is replaced by the id hash, the same
    * trade every deterministic operator in this module makes).
    * The importance-subsampling step of corpus curation: sample k
    * documents ∝ quality/token weight, reproducibly.
    *
    * Scale shape: priority is a narrow map (hash + two IEEE
    * divisions, codegen'd); the cut is TakeOrderedAndProject —
    * per-partition top-k then a k-row driver merge, no global sort
    * materializes. Determinism: h and w are integers < 2^53, each
    * division is one correctly-rounded IEEE op, and ties break on id
    * — DuckDB replaying the same two-step arithmetic reproduces the
    * exact double and the exact cut. */
  def weightedPrioritySample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    // u in (0, 1]: (h+1)/1000000007 with h in [0, 1000000006]
    val u = (contentHash(col(idCol)) + 1L).cast("double") /
      lit(1000000007.0)
    df.withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
  }

  /** Cluster-balanced coverage sampling (prototype selection): keep
    * the `quota` most-CENTRAL vectors of every trained IVF cell —
    * rank within a cell by cosine to the cell's own centroid
    * (descending; ties on id ascending), cut at `quota`. The
    * complement of SemDeDup's within-cell near-dup removal: where
    * dedup drops redundant cluster-mates, this selects each semantic
    * region's exemplars under a uniform per-cluster budget, so a
    * corpus dominated by one topic cannot crowd the sample — the
    * standard cluster-balanced selection step of training-data
    * curation pipelines. Returns (id, cell, centrality, rank).
    *
    * Scale shape: assignment + centrality are ONE narrow codegen'd
    * map against the k×dim centroid literal (no join against a
    * centroid table), and the frame is projected down to three
    * scalars BEFORE the window's exchange — embeddings never cross
    * the shuffle. The window partitions by cell: with the sensible
    * k ≈ √n regime (and quota ≪ cell size) cells are ~√n rows each,
    * thousands of them, so the sort is balanced across the cluster —
    * no global or single-partition stage anywhere.
    *
    * Determinism: the centrality is the SAME left-associated cosine
    * fold the assignment maximized (q_ann_ivf's oracle replays both
    * bit-identically), and rank ties break on id — so the selected
    * set is a pure function of the data on any cluster, any
    * partitioning, any engine. */
  def diverseSample(corpus: DataFrame, idCol: String, vecCol: String,
      model: graft.similarity.Ivf.IvfModel, quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    import org.apache.spark.sql.expressions.Window
    val cents = typedLit(model.centroids.map(_.toSeq))
    val assigned = corpus
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cell",
        graft.similarity.Ivf.assignCell(col("__v"), model))
      // cosine against the ASSIGNED centroid — by construction the
      // maximum the assignment just computed (same expression fold)
      .select(col("id"), col("cell"),
        graft.functions.VectorFunctions.cosine_sim(col("__v"),
          element_at(cents, col("cell") + 1)).as("centrality"))
    assigned
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(col("centrality").desc, col("id").asc)))
      .filter(col("rank") <= quota)
  }
}
