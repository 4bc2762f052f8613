package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Buffer fusing the three mergeable summaries the approximate
  * heavy-hitters query needs: a count-min sketch (seeded, so estimates
  * are deterministic), a Misra-Gries candidate map of at most `k`
  * counters, and the row total (carried by the sketch itself via
  * `totalCount`). */
final class HhBuffer(var cms: CountMinSketch,
    val mg: mutable.HashMap[Long, Long])

/** heavy_hitters_sketch(key, k, eps, confidence, seed): ONE pass over
  * the input fusing what `count()` + `stat.countMinSketch()` +
  * `stat.freqItems()` would otherwise compute in three scans — at the
  * 10^11-row regime this operator targets, three scans vs one is the
  * whole cost. Returns `struct(total, items: array<struct<key, est>>)`
  * where `items` holds the ≤ k Misra-Gries candidates (a SUPERSET of
  * every key with frequency > total/(k+1) — MG's deficiency bound of
  * N/(k+1) survives merging, Agarwal et al., "Mergeable Summaries",
  * PODS'12) with their count-min estimates (overestimate-only, error
  * ≤ eps·N w.h.p.), sorted by key.
  *
  * Scale shape: partial buffers are O(k + CMS width·depth) regardless
  * of key cardinality; executors merge partials pairwise (CMS adds
  * counter-wise, MG merges by count-sum then (k+1)-th-largest
  * subtraction), and only the fused digest reaches the driver — the
  * key space is never shuffled. The caller applies its threshold to
  * the returned estimates (e.g. `est * 100 > total`); filtering on the
  * OVERestimate keeps every true heavy hitter (no false negatives)
  * while keys within eps·N below the threshold may slip in as false
  * positives — a one-sided error, by construction.
  */
case class HeavyHittersSketch(child: Expression, k: Int, eps: Double,
    confidence: Double, seed: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HhBuffer]
    with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  // the child is unresolved at construction — type-check at analysis
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"heavy_hitters_sketch needs a BIGINT key, " +
        s"got ${child.dataType.simpleString}")

  private def itemType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("items", ArrayType(itemType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HhBuffer =
    new HhBuffer(CountMinSketch.create(eps, confidence, seed),
      mutable.HashMap.empty[Long, Long])

  /** Classic Misra-Gries step: hit → increment; room → insert;
    * full-and-miss → decrement every counter, dropping zeros. The
    * decrement-all case only fires on a miss with k live counters, so
    * the amortized cost per row stays O(1). */
  private def mgAdd(mg: mutable.HashMap[Long, Long], key: Long): Unit = {
    mg.get(key) match {
      case Some(c) => mg.update(key, c + 1L)
      case None if mg.size < k => mg.update(key, 1L)
      case None =>
        val dead = mg.iterator.filter(_._2 <= 1L).map(_._1).toList
        mg.mapValuesInPlace((_, c) => c - 1L)
        dead.foreach(mg.remove)
    }
  }

  override def update(buf: HhBuffer, input: InternalRow): HhBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      buf.cms.addLong(key)
      mgAdd(buf.mg, key)
    }
    buf
  }

  override def merge(b1: HhBuffer, b2: HhBuffer): HhBuffer = {
    b1.cms.mergeInPlace(b2.cms)
    // mergeable-summaries MG merge: counter-wise sum, then subtract
    // the (k+1)-th largest count and keep the strictly positive — the
    // combined deficiency stays ≤ (N1+N2)/(k+1)
    b2.mg.foreach { case (key, c) =>
      b1.mg.update(key, b1.mg.getOrElse(key, 0L) + c)
    }
    if (b1.mg.size > k) {
      val counts = b1.mg.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val dead = b1.mg.iterator.filter(_._2 <= cut).map(_._1).toList
      b1.mg.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(b1.mg.remove)
    }
    b1
  }

  override def eval(buf: HhBuffer): Any = {
    val items = buf.mg.keys.toArray
    java.util.Arrays.sort(items)
    val rows = items.map(key => new GenericInternalRow(
      Array[Any](key, buf.cms.estimateCount(key))))
    new GenericInternalRow(Array[Any](buf.cms.totalCount(),
      new GenericArrayData(rows.asInstanceOf[Array[Any]])))
  }

  // spill format: [cmsLen][cms bytes][n][key,count]*
  override def serialize(buf: HhBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val cmsBytes = {
      val b = new ByteArrayOutputStream()
      buf.cms.writeTo(b)
      b.toByteArray
    }
    out.writeInt(cmsBytes.length)
    out.write(cmsBytes)
    out.writeInt(buf.mg.size)
    buf.mg.foreach { case (key, c) =>
      out.writeLong(key); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HhBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cmsBytes = new Array[Byte](in.readInt())
    in.readFully(cmsBytes)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))
    val n = in.readInt()
    val mg = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) {
      val key = in.readLong(); val c = in.readLong()
      mg.update(key, c)
      i += 1
    }
    new HhBuffer(cms, mg)
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "heavy_hitters_sketch"
}

object HeavyHittersSketch {
  def heavy_hitters_sketch(e: Column, k: Int, eps: Double,
      confidence: Double, seed: Int): Column =
    GraftSqlShims.column(
      HeavyHittersSketch(GraftSqlShims.expression(e), k, eps, confidence,
        seed).toAggregateExpression())
}
