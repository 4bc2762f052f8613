package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

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
  * NULL (the caller decides what to do with overflowed groups —
  * Dedup.bucketPairsRaw star-links their members against a min-elem
  * representative computed in the same aggregation), and healthy
  * groups pay nothing extra. Null input elements are skipped,
  * matching collect_list.
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

object CappedCollectFunctions {
  def capped_collect_list(e: Column, max: Int): Column =
    GraftSqlShims.column(
      CappedCollectList(GraftSqlShims.expression(e), max)
        .toAggregateExpression())
}
