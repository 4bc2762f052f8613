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
    * here; record the build-k next to persisted sketch columns
    * ([[graft.lake.Lake.writePartitionSketches]] fixes one k per
    * table) and union at min(build-ks). */
  def kmv_union(a: Column, b: Column, k: Int): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Distinct-count estimate read off a sketch array (the same
    * closed form [[KMinValues]] evaluates internally): exact size
    * while under-filled, else (k−1)·2^domainBits div h_k —
    * INTEGER division (a double round-trip could be off by an ulp
    * and break cross-engine hash equality). Same parameter guards as
    * the aggregate: an overflowing (k−1)<<domainBits must fail fast
    * here too, not return negative estimates. */
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
