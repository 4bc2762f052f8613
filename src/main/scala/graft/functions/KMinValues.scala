package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared buffer protocol of the two KMV aggregates: a bounded
  * TreeSet of the k smallest DISTINCT hash values, with a common
  * spill wire format (count + longs) that both forms share — one
  * place to change insert/merge/serialization semantics, zero
  * divergence risk between the estimate and sketch forms. */
trait KmvAggregateBase
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  def k: Int
  def prettyName: String

  // the child is unresolved at construction — type-check at analysis
  // (the HeavyHittersSketch pattern: a non-BIGINT hash column must
  // fail analysis, not ClassCastException inside a running stage)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a BIGINT hash input, " +
        s"got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  protected final def insert(buf: java.util.TreeSet[java.lang.Long],
      v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  // spill format: count + ascending longs
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }
}

/** k-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al.
  * 2002): keep the k smallest DISTINCT hash values seen; if fewer than
  * k were ever held the sketch saw the whole value set and the count
  * is exact, otherwise estimate |set| ≈ (k−1) · 2^domainBits / h_k
  * where h_k is the k-th smallest hash.
  *
  * Why this exists next to `hll_sketch_agg`/`approx_count_distinct`:
  * KMV over a FIXED hash is a pure function of the value SET —
  * independent of row order, partitioning, merge order, and engine —
  * so the ESTIMATE ITSELF is hash-comparable across engines
  * (`(k−1)·2^b div h_k` in integer arithmetic replays anywhere),
  * where HLL's register layout is implementation-defined and can only
  * be envelope-checked. The price is accuracy per byte (stderr ≈
  * 1/√(k−2)); the win is bit-reproducible cardinality columns in
  * parity pipelines and tests.
  *
  * Scale shape: O(k) state per group (a bounded tree — a degenerate
  * billion-row group costs the same 8·k bytes as a healthy one),
  * map-side partial aggregation, merges are set-unions capped at k.
  *
  * Input contract: `child` is a uniform hash in [0, 2^domainBits) —
  * see [[KmvFunctions.kmv_hash48]] for the portable md5-prefix form.
  * Null inputs are skipped. Empty groups estimate 0.
  */
case class KMinValues(child: Expression, k: Int, domainBits: Int = 48,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvAggregateBase {
  KmvFunctions.validateParams(k, domainBits)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else ((k - 1).toLong << domainBits) / buf.last()

  override def withNewMutableAggBufferOffset(offset: Int): KMinValues =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValues =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kmv_distinct"
}

/** kmv_sketch(e, k): the sketch ITSELF — the k smallest distinct hash
  * values as a sorted ascending array — instead of the collapsed
  * estimate. This is the mergeable form: sketches of arbitrary
  * partitions combine by "union then keep k smallest"
  * ([[KmvFunctions.kmv_union]], pure array built-ins), and two
  * sketches over a SHARED hash function support set algebra — the
  * classic KMV Jaccard estimator |K(A∪B) ∩ A ∩ B| / |K(A∪B)|
  * ([[KmvFunctions.kmv_jaccard]]). Everything downstream of the
  * aggregate is deterministic integer/array arithmetic, so estimates
  * composed from stored sketches replay bit-identically in any
  * engine — sketch columns can be persisted per partition/day and
  * algebra'd later without touching the corpus again (the property
  * that matters at 100 TB: never re-scan to answer a new
  * cardinality/overlap question). Same O(k) bounded state and input
  * contract as [[KMinValues]]. */
case class KMinValuesSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends KmvAggregateBase {
  require(k >= 2, s"k must be >= 2, got $k")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValuesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValuesSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

/** kmv_sample(h, v, k): the ORDER-STATISTICS sibling of
  * [[KMinValuesSketch]] — keep the k lexicographically-smallest
  * distinct (hash, value) pairs, where `h` is a uniform hash of the
  * row's IDENTITY (not its value: [[KmvFunctions.kmv_hash48]] over a
  * unique id column). The carried values then form a simple random
  * sample of the group's rows that is a pure function of the row SET
  * — independent of row order, partitioning, merge order, and engine
  * — so quantile estimates read off it replay bit-identically
  * anywhere (no arithmetic is ever performed on the values; an
  * estimate IS a sampled value).
  *
  * The algebra that makes it a sketch: the k smallest pairs of a
  * union of per-partition k-smallest sets is EXACTLY the k smallest
  * pairs of the union of the partitions — so bottom-k samples merge
  * losslessly ([[KmvFunctions.kmv_sample_union]], pure array
  * built-ins), and a persisted per-partition/day sample column
  * answers later quantile questions over ARBITRARY partition unions
  * without re-scanning the corpus — the same 100 TB property as the
  * KMV cardinality sketch, extended from "how many" to "how
  * distributed". Sampling error is the usual SRS bound (the p-th
  * sample quantile is within O(√(p(1−p)/k)) quantile mass of the
  * true one w.h.p.), vs `percentile_approx` whose sketch is neither
  * mergeable-across-engines nor reproducible.
  *
  * Scale shape: O(k) bounded state per group (16·k bytes; a
  * billion-row group costs the same as a healthy one), map-side
  * partial aggregation, merges are capped pair-set unions.
  *
  * Hash ties (two ids colliding in 48 bits) keep BOTH pairs ordered
  * by value — the pair-set semantics stays a pure set function.
  * Null hashes or values are skipped. Output is the sorted
  * array<struct<h,v>>; read values off it with
  * [[KmvFunctions.kmv_sample_quantile]]. */
case class KMinValuesSample(left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sample needs a BIGINT hash input, " +
          s"got ${left.dataType.simpleString}")
    else if (right.dataType != org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_sample needs a DOUBLE value input, " +
          s"got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = KmvFunctions.sampleEntryArrayType
  override def nullable: Boolean = false

  private val ord: Ordering[(Long, Double)] = Ordering.Tuple2(
    Ordering.Long, Ordering.Double.TotalOrdering)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  private def insert(buf: java.util.TreeSet[(Long, Double)],
      p: (Long, Double)): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (ord.lt(p, buf.last())) { if (buf.add(p)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[(Long, Double)],
      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(b1: java.util.TreeSet[(Long, Double)],
      b2: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      arr(i) = InternalRow(h, v)
      i += 1
    }
    new GenericArrayData(arr)
  }

  // spill format: count + (hash long, value double-bits) pairs
  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (h, v) = it.next()
      bb.putLong(h); bb.putDouble(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KMinValuesSample =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KMinValuesSample =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_sample"
}

object KmvFunctions {

  /** Shared parameter validation: every path that evaluates the
    * closed form (k−1)·2^domainBits — aggregate or stored-sketch —
    * must reject parameters whose shift overflows Long, or the
    * "estimate" silently goes negative. */
  private[functions] def validateParams(k: Int, domainBits: Int): Unit = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(domainBits >= 1 && domainBits <= 56,
      s"domainBits must be in [1,56], got $domainBits")
    require((k - 1).toLong <= (Long.MaxValue >> domainBits),
      s"(k-1)*2^$domainBits overflows Long")
  }

  /** KMV distinct estimate of `e` (already a uniform hash in
    * [0, 2^domainBits)) with a k-value sketch. */
  def kmv_distinct(e: Column, k: Int, domainBits: Int = 48): Column =
    GraftSqlShims.column(
      KMinValues(GraftSqlShims.expression(e), k, domainBits)
        .toAggregateExpression())

  /** The k smallest distinct hashes as a sorted array — the mergeable
    * sketch form (see [[KMinValuesSketch]]). */
  def kmv_sketch(e: Column, k: Int): Column =
    GraftSqlShims.column(
      KMinValuesSketch(GraftSqlShims.expression(e), k)
        .toAggregateExpression())

  /** Union of two KMV sketches over the SAME hash: the k smallest of
    * the combined value set. Pure array built-ins — composable on
    * stored sketch columns without touching the corpus.
    *
    * `k` contract: must not exceed the build-k of either input WHEN
    * that input is full (size == its build-k). A full sketch's tail
    * is truncated — values between the two originals' k-th minima are
    * simply absent — so a larger-k "union" would be missing interior
    * values and `kmv_estimate` over it biases LOW with no error. The
    * array alone cannot distinguish "full at build-k = s" from
    * "under-filled" (an under-filled sketch carries its WHOLE value
    * set and unions exactly at any k), so this cannot be asserted
    * here — and a heuristic guard on the bare arrays (e.g. raising
    * when both sizes are equal and below k) would be UNSOUND: two
    * genuinely under-filled inputs of coincidentally equal size are a
    * legitimate, exactly-unionable case that must not raise. The
    * enforceable fix is to record the build-k next to persisted
    * sketch columns ([[graft.lake.Lake.writePartitionSketches]] lands
    * a `build_k` column beside every sketch) and union through
    * [[kmv_union_checked]], which raises on the one provably-biased
    * case: an input that is FULL at a build-k smaller than the
    * requested k. */
  def kmv_union(a: Column, b: Column, k: Int): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** The truncated-tail runtime guard for one sketch input: `s` is
    * provably biased for a size-`k` read iff it is FULL at its
    * recorded build-k AND that build-k is smaller than `k` — its tail
    * was cut, so interior values a k-union/k-estimate would need are
    * absent. Under-filled inputs (size < build-k) carry their whole
    * value set and pass at any k. Returns `s` unchanged when sound,
    * raises otherwise — the `when` keeps the guard a pure expression,
    * composable on stored sketch columns. */
  private def checkedSketch(s: Column, buildK: Column, k: Int,
      op: String): Column =
    when(lit(k) <= buildK || size(s) < buildK, s)
      .otherwise(raise_error(concat(
        lit(s"$op: sketch is full at build_k="), buildK.cast("string"),
        lit(s" < requested k=$k — its tail was truncated and a k=$k " +
          "read would bias low; re-read at k <= build_k or rebuild " +
          "the sketch at a larger k"))))

  /** [[kmv_union]] with the build-k contract ASSERTED at runtime from
    * the `build_k` values persisted beside stored sketches
    * ([[graft.lake.Lake.writePartitionSketches]]): raises when either
    * input is full at a build-k below `k` instead of returning a
    * silently-low union. */
  def kmv_union_checked(a: Column, buildKa: Column, b: Column,
      buildKb: Column, k: Int): Column =
    kmv_union(checkedSketch(a, buildKa, k, "kmv_union"),
      checkedSketch(b, buildKb, k, "kmv_union"), k)

  /** Distinct-count estimate read off a sketch array (the same
    * closed form [[KMinValues]] evaluates internally): exact size
    * while under-filled, else (k−1)·2^domainBits div h_k —
    * INTEGER division (a double round-trip could be off by an ulp
    * and break cross-engine hash equality). Same parameter guards as
    * the aggregate: an overflowing (k−1)<<domainBits must fail fast
    * here too, not return negative estimates. Divisor edge: h_k = 0
    * cannot arise from a well-formed sketch — entries are DISTINCT
    * non-negative integers in ascending order, so h_k ≥ k−1 ≥ 1 for
    * the k ≥ 2 this function requires (and every producer in this
    * module builds distinct: the aggregates keep distinct hashes,
    * [[kmv_union]] and [[kmv_join_size]] go through array_distinct).
    * A malformed hand-built array with duplicates could reach a zero
    * k-th minimum; the integral divide then fails loud under ANSI
    * (division by zero) rather than returning a defined-looking
    * estimate — the correct outcome for corrupt input. */
  def kmv_estimate(sketch: Column, k: Int, domainBits: Int = 48): Column = {
    validateParams(k, domainBits)
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(GraftSqlShims.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          GraftSqlShims.expression(lit((k - 1).toLong << domainBits)),
          GraftSqlShims.expression(element_at(sketch, k)))))
  }

  /** KMV Jaccard estimator between two sketches over the same hash:
    * |K(A∪B) ∩ A ∩ B| / |K(A∪B)| (Beyer et al. 2007). One integer
    * division — bit-reproducible anywhere the sketches are. */
  def kmv_jaccard(a: Column, b: Column, k: Int): Column = {
    val ku = kmv_union(a, b, k)
    size(array_intersect(array_intersect(ku, a), b)).cast("double") /
      size(ku).cast("double")
  }

  private[functions] val sampleEntryArrayType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)

  /** Bottom-k-by-hash row sample with carried values — the mergeable
    * order-statistics sketch (see [[KMinValuesSample]]). `h` must be
    * a uniform BIGINT hash of the row's unique id ([[kmv_hash48]]);
    * `v` the DOUBLE measure to sample. */
  def kmv_sample(h: Column, v: Column, k: Int): Column =
    GraftSqlShims.column(
      KMinValuesSample(GraftSqlShims.expression(h),
        GraftSqlShims.expression(v), k).toAggregateExpression())

  /** Union of two bottom-k samples over the SAME id hash: the k
    * smallest distinct (h, v) pairs of the combined sets — EXACTLY
    * the sample that [[kmv_sample]] would have built over the
    * concatenated inputs (bottom-k-of-union == bottom-k of the union
    * of bottom-ks), so stored per-partition sample columns compose
    * losslessly. Pure array built-ins; same build-k contract as
    * [[kmv_union]] — assert it from persisted `build_k` values via
    * [[kmv_sample_union_checked]]. */
  def kmv_sample_union(a: Column, b: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** [[kmv_sample_union]] with the build-k contract ASSERTED at
    * runtime (see [[kmv_union_checked]]). */
  def kmv_sample_union_checked(a: Column, buildKa: Column, b: Column,
      buildKb: Column, k: Int): Column =
    kmv_sample_union(checkedSketch(a, buildKa, k, "kmv_sample_union"),
      checkedSketch(b, buildKb, k, "kmv_sample_union"), k)

  /** The sample's values in ascending order — the empirical
    * distribution the quantile reads index into. */
  def kmv_sample_values(sketch: Column): Column =
    array_sort(transform(sketch, e => e.getField("v")))

  /** Quantile estimate read off a sample sketch: the sampled value at
    * 1-based index floor(q·(n−1)) + 1 (lower-index rule — NO
    * interpolation, so the result is always a genuinely observed
    * value and replays bit-identically: the only arithmetic is one
    * IEEE multiply both engines round identically). Null on an empty
    * sketch. */
  def kmv_sample_quantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val idx = floor(lit(q) * (size(sketch) - 1).cast("double"))
      .cast("int") + 1
    when(size(sketch) === 0, lit(null).cast("double"))
      .otherwise(element_at(kmv_sample_values(sketch), idx))
  }

  /** Equi-join output-size estimate from two stored KEY-COUNT samples
    * — the generic-join sibling of the EditJoin pre-flight: price a
    * join from two O(k) sketches BEFORE shuffling a single corpus
    * byte, and refuse loud when the product would explode.
    *
    * Contract: each input is [[kmv_sample]] built over the side's
    * DISTINCT-KEY counts frame — `kmv_sample(kmv_hash48(key),
    * count(*) per key, k)` — so a sampled pair is (key-hash, that
    * key's row count). The estimator is the classic bottom-k join
    * synopsis: take U = the k smallest hashes of the combined key
    * sets (a valid KMV sketch of |keys(A) ∪ keys(B)|, so
    * [[kmv_estimate]] prices the key domain), sum cA·cB over the
    * sampled keys present on BOTH sides (every h ∈ U that a side
    * holds is guaranteed inside that side's bottom-k: U's k-th
    * minimum never exceeds either side's), and scale by
    * |domain| / k. When U is under-filled both samples held ALL
    * their keys and the sum IS the exact join size.
    *
    * Everything is order-independent exact arithmetic — counts are
    * integer-valued doubles (exact to 2^53), the scale-up runs in
    * DECIMAL(38,0) with integral `div` (a BIGINT product would wrap
    * at ~3e9 × 3e9) — so the estimate replays bit-identically in any
    * engine holding the same sketches. A 48-bit hash tie between two
    * DIFFERENT keys fails loud via an EXPLICIT duplicate-hash check
    * on each input (size vs array_distinct size, raising with the
    * offending side named) — deliberately not left to
    * map_from_entries' duplicate-key error, which only fires while
    * spark.sql.mapKeyDedupPolicy keeps its EXCEPTION default; a
    * session configured LAST_WIN would otherwise silently drop one
    * (hash, count) pair and mis-price the join with no error.
    *
    * `k` contract (the same discipline as [[kmv_union]]): `k` must
    * not exceed the build-k of either input when that input is FULL —
    * a truncated sketch evaluated at a larger k can read as
    * "under-filled" and return a silently-low "exact" size. Record
    * the build-k next to persisted sketch columns and price at
    * min(build-ks). */
  def kmv_join_size(sa0: Column, sb0: Column, k: Int,
      domainBits: Int = 48): Column = {
    validateParams(k, domainBits)
    def distinctChecked(s: Column, side: String): Column =
      when(size(array_distinct(transform(s, e => e.getField("h"))))
          === size(s), s)
        .otherwise(raise_error(lit(s"kmv_join_size: duplicate 48-bit " +
          s"key hash in the $side sketch — two distinct keys " +
          "collided (or the sample was built over a non-distinct key " +
          "frame); rebuild over distinct keys or widen the hash")))
    val sa = distinctChecked(sa0, "left")
    val sb = distinctChecked(sb0, "right")
    val ha = transform(sa, e => e.getField("h"))
    val hb = transform(sb, e => e.getField("h"))
    val hu = slice(array_sort(array_distinct(concat(ha, hb))), 1, k)
    val ma = map_from_entries(sa)
    val mb = map_from_entries(sb)
    val common = filter(hu, h =>
      map_contains_key(ma, h) && map_contains_key(mb, h))
    val sampledPairs = aggregate(common, lit(0.0),
      (acc, h) => acc + element_at(ma, h) * element_at(mb, h))
      .cast("long")
    val scaled = GraftSqlShims.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftSqlShims.expression(
          sampledPairs.cast("decimal(38,0)") *
            kmv_estimate(hu, k, domainBits)),
        GraftSqlShims.expression(lit(k.toLong))))
    when(size(hu) < k, sampledPairs).otherwise(scaled)
  }

  /** [[kmv_join_size]] with the build-k contract ASSERTED at runtime
    * (see [[kmv_union_checked]]): `buildKa`/`buildKb` are the
    * `build_k` values persisted beside the stored samples. Raises
    * when either input is full at a build-k below `k` — exactly the
    * case where the under-filled branch would return a silently-low
    * "exact" size. */
  def kmv_join_size_checked(sa: Column, buildKa: Column, sb: Column,
      buildKb: Column, k: Int, domainBits: Int = 48): Column =
    kmv_join_size(checkedSketch(sa, buildKa, k, "kmv_join_size"),
      checkedSketch(sb, buildKb, k, "kmv_join_size"), k, domainBits)

  /** Portable 48-bit uniform hash: the numeric value of the first 12
    * hex digits of md5 over the value's STRING form — replayable in
    * any engine with an md5 and a hex-string→integer cast (DuckDB:
    * `CAST(concat('0x', substr(md5(x), 1, 12)) AS BIGINT)`, which
    * likewise hashes the varchar's UTF-8 bytes). The string hop also
    * keeps ANSI mode happy for numeric inputs (BIGINT→BINARY casts
    * are rejected). Feed this to [[kmv_distinct]] with the default
    * domainBits = 48. */
  def kmv_hash48(e: Column): Column =
    conv(substring(md5(e.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")
}
