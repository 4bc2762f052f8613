package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StructField, StructType}

/** Mutable buffer: collects up to `max` elements, then flips to
  * overflowed and RELEASES the collected elements — memory stays
  * O(max) no matter how many rows a group receives. */
final class CappedBuffer(
    var overflowed: Boolean = false,
    val items: ArrayBuffer[Any] = ArrayBuffer.empty[Any])

/** capped_collect_list(e, max): `collect_list(e)` that returns NULL
  * for any group exceeding `max` elements — with a buffer that stops
  * growing at the cap, instead of materializing the full list first
  * and filtering afterwards.
  *
  * This is the skew-safe primitive behind LSH bucket-pair generation:
  * a degenerate corpus (10M boilerplate near-identical docs in one
  * band bucket) must NOT build a 10M-element aggregation buffer — a
  * single group's collect_list cannot spill. Here the worst group
  * costs max elements + a boolean, the oversized bucket surfaces as
  * NULL (the caller decides what to do with overflowed groups; when
  * the caller also needs a per-group representative of the dropped
  * members, use [[CappedCollectWithRep]]), and healthy groups pay
  * nothing extra. Null input elements are skipped, matching
  * collect_list.
  */
case class CappedCollectList(child: Expression, max: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedBuffer]
    with UnaryLike[Expression] {
  require(max > 0)

  override def dataType: DataType = ArrayType(child.dataType,
    containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): CappedBuffer = new CappedBuffer

  private def add(buf: CappedBuffer, v: Any): CappedBuffer = {
    if (!buf.overflowed && v != null) {
      if (buf.items.length >= max) {
        buf.overflowed = true
        buf.items.clear() // release — this group is already dropped
      } else buf.items += InternalRow.copyValue(v)
    }
    buf
  }

  override def update(buf: CappedBuffer, input: InternalRow): CappedBuffer =
    add(buf, child.eval(input))

  override def merge(b1: CappedBuffer, b2: CappedBuffer): CappedBuffer = {
    if (b2.overflowed) { b1.overflowed = true; b1.items.clear() }
    else {
      var i = 0
      while (i < b2.items.length && !b1.overflowed) {
        // values in b2 are already copies — no re-copy needed
        if (b1.items.length >= max) { b1.overflowed = true; b1.items.clear() }
        else b1.items += b2.items(i)
        i += 1
      }
    }
    b1
  }

  override def eval(buf: CappedBuffer): Any =
    if (buf.overflowed) null
    else new GenericArrayData(buf.items.toArray)

  // spill format: one UnsafeRow of (overflowed, items)
  private lazy val ser = UnsafeProjection.create(Array[DataType](
    BooleanType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: CappedBuffer): Array[Byte] = {
    val row = ser(InternalRow(buf.overflowed,
      new GenericArrayData(buf.items.toArray)))
    row.getBytes
  }

  override def deserialize(bytes: Array[Byte]): CappedBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new CappedBuffer(row.getBoolean(0))
    if (!buf.overflowed) {
      val arr = row.getArray(1)
      var i = 0
      while (i < arr.numElements()) {
        buf.items += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CappedCollectList =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "capped_collect_list"
}

/** Buffer for [[CappedCollectWithRep]]: the capped list plus a running
  * min (`rep`) that is materialized only once the group overflows —
  * healthy groups never pay a comparison, overflowed groups keep an
  * O(1) representative of EVERY element they ever saw. */
final class CappedRepBuffer(
    var overflowed: Boolean = false,
    var rep: Any = null,
    val items: ArrayBuffer[Any] = ArrayBuffer.empty[Any])

/** capped_collect_with_rep(e, max): like [[CappedCollectList]] but
  * returns struct(items, rep) where `items` is NULL for any group
  * exceeding `max` elements and `rep` is then the MINIMUM of all
  * elements the group received (by Catalyst's interpreted ordering —
  * the same ordering `sort_array`/`min` use, so a min-rep pairs
  * consistently with sorted-combination pair generation).
  *
  * This lets LSH bucket-pair generation star-link an oversized
  * bucket's members against a representative computed IN the one
  * bucket aggregation: no second scan of the corpus, no second
  * aggregation over the overflowed members — the fallback's only
  * remaining plan cost is one broadcast join (Dedup.bucketPairsRaw).
  * The min is tracked lazily: until a group overflows, no comparison
  * runs at all (the eventual rep is recovered from the buffered items
  * at the moment of overflow), so healthy buckets pay exactly what
  * capped_collect_list pays. `rep` is NULL for groups that never
  * overflowed (callers read it only when `items` is NULL).
  */
case class CappedCollectWithRep(child: Expression, max: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedRepBuffer]
    with UnaryLike[Expression] {
  require(max > 0)

  private def itemsType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def dataType: DataType = StructType(Seq(
    StructField("items", itemsType, nullable = true),
    StructField("rep", child.dataType, nullable = true)))
  override def nullable: Boolean = false

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): CappedRepBuffer =
    new CappedRepBuffer

  // v must already be safe to retain (copied)
  private def bumpRep(buf: CappedRepBuffer, v: Any): Unit =
    if (buf.rep == null || ordering.lt(v, buf.rep)) buf.rep = v

  // v may be a reused evaluation buffer: compare FIRST (the ordering
  // reads without retaining), copy only on a new minimum — a
  // degenerate multi-million-row group must cost O(#minima) copies,
  // not one transient deep copy per input row
  private def bumpRepCopying(buf: CappedRepBuffer, v: Any): Unit =
    if (buf.rep == null || ordering.lt(v, buf.rep))
      buf.rep = InternalRow.copyValue(v)

  // flip to overflowed: seed rep from the buffered items, release them
  private def overflow(buf: CappedRepBuffer): Unit = {
    buf.overflowed = true
    buf.items.foreach(bumpRep(buf, _))
    buf.items.clear()
  }

  private def add(buf: CappedRepBuffer, v0: Any): CappedRepBuffer = {
    if (v0 != null) {
      if (buf.overflowed) bumpRepCopying(buf, v0)
      else if (buf.items.length >= max) { overflow(buf); bumpRepCopying(buf, v0) }
      else buf.items += InternalRow.copyValue(v0)
    }
    buf
  }

  override def update(buf: CappedRepBuffer, input: InternalRow): CappedRepBuffer =
    add(buf, child.eval(input))

  override def merge(b1: CappedRepBuffer, b2: CappedRepBuffer): CappedRepBuffer = {
    if (b2.overflowed) {
      if (!b1.overflowed) overflow(b1)
      bumpRep(b1, b2.rep)
    } else {
      var i = 0
      while (i < b2.items.length) {
        // values in b2 are already copies — no re-copy needed
        val v = b2.items(i)
        if (b1.overflowed) bumpRep(b1, v)
        else if (b1.items.length >= max) { overflow(b1); bumpRep(b1, v) }
        else b1.items += v
        i += 1
      }
    }
    b1
  }

  override def eval(buf: CappedRepBuffer): Any =
    if (buf.overflowed) new GenericInternalRow(Array[Any](null, buf.rep))
    else new GenericInternalRow(
      Array[Any](new GenericArrayData(buf.items.toArray), null))

  // spill format: one UnsafeRow of (overflowed, items, rep)
  private lazy val ser = UnsafeProjection.create(Array[DataType](
    BooleanType, itemsType, child.dataType))

  override def serialize(buf: CappedRepBuffer): Array[Byte] = {
    val row = ser(InternalRow(buf.overflowed,
      new GenericArrayData(buf.items.toArray), buf.rep))
    row.getBytes
  }

  override def deserialize(bytes: Array[Byte]): CappedRepBuffer = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val buf = new CappedRepBuffer(row.getBoolean(0))
    if (buf.overflowed) {
      buf.rep = InternalRow.copyValue(row.get(2, child.dataType))
    } else {
      val arr = row.getArray(1)
      var i = 0
      while (i < arr.numElements()) {
        buf.items += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CappedCollectWithRep =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CappedCollectWithRep =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "capped_collect_with_rep"
}

object CappedCollectFunctions {
  def capped_collect_list(e: Column, max: Int): Column =
    GraftSqlShims.column(
      CappedCollectList(GraftSqlShims.expression(e), max)
        .toAggregateExpression())

  def capped_collect_with_rep(e: Column, max: Int): Column =
    GraftSqlShims.column(
      CappedCollectWithRep(GraftSqlShims.expression(e), max)
        .toAggregateExpression())
}
