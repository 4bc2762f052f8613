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

  /** Fixed-grid resampling with gap fill — the time-series
    * regularization step (hourly feature tables, training curricula
    * over event history) that event streams need before any
    * sequence model sees them: aggregate onto a `unit` grid
    * (`"hour"`/`"day"`/`"minute"`), then materialize EVERY grid slot
    * between each key's first and last active bucket, carrying the
    * last observed value forward across the gaps.
    *
    * Output: `keyCol`, `bucket_ts`, each aggregate from `aggs` (null
    * on gap rows — callers coalesce counts to 0 if they want), one
    * `<c>_filled` per `fillCols` entry (running `last` ignoring
    * nulls), and `is_gap`.
    *
    * Scale shape: the only pass over the raw table is the first
    * aggregation (partial map-side combine, one shuffle on
    * (key, bucket)); everything after runs over the BUCKETIZED table —
    * smaller than the input by the events-per-bucket factor. Gap slots
    * come from LEAD expansion, not a grid join: each bucket row emits
    * the slots up to (exclusive) the key's next active bucket, so the
    * bucket table is consumed ONCE (no span re-aggregation, no grid
    * self-join — a grid build via min/max spans would scan the
    * aggregate twice), and forward fill is the generating row's own
    * running value — the fill window and the lead share one sort. The
    * output size is bounded by span × keys, not by input rows; a key
    * idle for years then active again does inflate its span — callers
    * windowing by ingest partition (the usual incremental shape)
    * bound it naturally. */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      unit: String, aggs: Seq[Column], fillCols: Seq[String]): DataFrame = {
    require(Set("minute", "hour", "day", "week").contains(unit.toLowerCase),
      s"unsupported resample unit '$unit'")
    require(aggs.nonEmpty, "resample needs at least one aggregate")
    val aggd = df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket_ts"))
      .agg(aggs.head, aggs.tail: _*)
    val aggCols = aggd.columns.filterNot(c =>
      c == keyCol || c == "bucket_ts").toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
    // running fill over PRESENT buckets only — gap slots inherit their
    // generating row's value below, which extends the fill across gaps
    val withFill = fillCols.foldLeft(aggd)((acc, c) =>
      acc.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val expanded = withFill
      .withColumn("__next", lead(col("bucket_ts"), 1).over(w))
      .withColumn("__slot", explode(expr(
        s"""sequence(bucket_ts,
           |  coalesce(__next - interval 1 $unit, bucket_ts),
           |  interval 1 $unit)""".stripMargin)))
      .withColumn("is_gap", col("__slot") =!= col("bucket_ts"))
    expanded.select(
      Seq(col(keyCol), col("__slot").as("bucket_ts")) ++
        aggCols.map(c => when(col("is_gap"), lit(null)).otherwise(col(c))
          .as(c)) ++
        fillCols.map(c => col(s"${c}_filled")) :+
        col("is_gap"): _*)
  }
}
