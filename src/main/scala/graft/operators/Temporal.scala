package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference lacks but any event-history
  * workload needs: as-of join and bounded-gap (band) self-join. Both
  * are built as compositions of stock Spark operators chosen for their
  * 100 TB shape — neither materializes a range-predicate cross product.
  *
  * Why not a custom SparkStrategy: the union-window as-of and the
  * bin-bucketed band join already compile to one shuffle + linear
  * per-partition work, which is the same physical shape a native
  * operator would have; Catalyst handles the rest (pushdown, codegen,
  * AQE) for free.
  */
object Temporal {

  /** As-of join: for every left row, the latest right row with
    * `right.ts <= left.ts` for the same key (the "most recent quote
    * for each trade" shape).
    *
    * Implementation is the scale-correct union + running-last-value
    * pattern, NOT a range join: union both sides, hash-partition once
    * by key, sort within partitions by (ts, right-before-left), and
    * carry the last seen right payload forward with a running
    * `last(_, ignoreNulls = true)` window. One shuffle on the key,
    * linear scan per partition, no candidate explosion no matter how
    * dense the right side is. Rows with equal timestamps match
    * (at-or-before); the right side must be unique per (key, ts) —
    * pre-aggregate if it isn't.
    *
    * Output: every left column, plus each payload column as
    * `asof_<name>` (null when no right row is at-or-before).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = right
      .select(struct(payloadCols.map(col): _*)).schema.head.dataType
    // SQL as-of semantics for nulls: a right row with null key or null
    // ts can never satisfy `right.ts <= left.ts on key` — drop them
    // here, or the nulls-first sort would carry a null-ts payload into
    // every left row (and null keys would match each other)
    val rTagged = right
      .filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .select(col(keyCol).as("__k"),
        col(rightTsCol).as("__ts"), lit(1).as("__is_right"),
        struct(payloadCols.map(col): _*).as("__payload"))
    val lTagged = left.select(col(keyCol).as("__k"),
      col(leftTsCol).as("__ts"), lit(0).as("__is_right"),
      lit(null).cast(payloadType).as("__payload"),
      struct(leftCols.map(col): _*).as("__left"))
    val unioned = rTagged
      .withColumn("__left", lit(null).cast(lTagged.schema("__left").dataType))
      .unionByName(lTagged)
    // right rows sort BEFORE left rows at the same timestamp so a
    // ts-equal right row is visible to the left row (at-or-before)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_right") === 0)
    val outLeft = leftCols.map(c => col(s"__left.$c").as(c))
    val outPayload = payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c"))
    joined.select(outLeft ++ outPayload: _*)
  }

  /** Bounded-gap self-join: all pairs (a, b) of rows sharing `keyCol`
    * with `0 <= ts(b) - ts(a) <= maxGapUs`, a strictly the earlier row
    * (ties broken by id), so each unordered pair appears exactly once.
    *
    * Implementation: time-bin bucketing, the standard band-join
    * rewrite. Each row lands in bin ts div gap; a pair within `gap`
    * spans at most adjacent bins, so probing {bin, bin+1} from the
    * earlier side finds every pair while joining only on the equi-key
    * (key, bin) — no range cross product. Each qualifying pair is
    * produced exactly once (the later row's own bin is unique), so no
    * dedup shuffle either. The bin quotient is computed as
    * (t - t mod gap) / gap — exact in IEEE double for µs timestamps,
    * identical in any engine. Output: key, idA, idB, gap_us.
    */
  def boundedGapSelfJoin(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, maxGapUs: Long): DataFrame = {
    require(maxGapUs > 0)
    val g = lit(maxGapUs)
    def binOf(t: Column): Column = ((t - pmod(t, g)) / g).cast("long")
    val base = df.select(col(keyCol).as("__k"),
      unix_micros(col(tsCol)).as("__t"), col(idCol).as("__id"))
    val probe = base.select(col("__k"), col("__t").as("tA"),
      col("__id").as("idA"),
      explode(array(binOf(col("__t")), binOf(col("__t")) + 1L)).as("__bin"))
    val build = base.select(col("__k"), col("__t").as("tB"),
      col("__id").as("idB"), binOf(col("__t")).as("__bin"))
    probe.join(build, Seq("__k", "__bin"))
      .filter((col("tA") < col("tB") ||
        (col("tA") === col("tB") && col("idA") < col("idB"))) &&
        col("tB") - col("tA") <= g)
      .select(col("__k").as(keyCol), col("idA"), col("idB"),
        (col("tB") - col("tA")).as("gap_us"))
  }
}
