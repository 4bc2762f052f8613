package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** Single-pass table profiler — the "what does this table look like"
  * primitive a DQ pipeline runs before writing rules.
  *
  * All requested columns' metrics compile into ONE aggregation over the
  * table (count/nulls/min/max/sum and HLL distinct per column), then a
  * narrow unpivot to long format (column, metric, value). At 100 TB
  * that is a single scan with map-side partial aggregation; the unpivot
  * happens on the one-row aggregate, i.e. for free.
  *
  * Sums are computed over DECIMAL(18,2)-cast values so means are
  * order-independent (double summation is not associative under
  * parallelism).
  */
object Profiler {

  /** Long-format numeric profile: (column, metric, value) with metrics
    * row_count, null_count, approx_distinct, min, max, sum, mean. */
  def profileNumeric(df: DataFrame, columns: Seq[String]): DataFrame = {
    val numeric = columns.filter(c =>
      df.schema(c).dataType.isInstanceOf[NumericType])
    require(numeric == columns,
      s"non-numeric columns requested: ${columns.diff(numeric)}")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).cast("double").as(s"${c}__row_count"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")
          .as(s"${c}__null_count"),
        approx_count_distinct(col(c)).cast("double")
          .as(s"${c}__approx_distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(DecimalType(18, 2))).cast("double").as(s"${c}__sum"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row to (column, metric, value), and
    // derive mean = sum / (row_count - null_count) per column
    val stacked = columns.map { c =>
      val nonNull = col(s"${c}__row_count") - col(s"${c}__null_count")
      array(
        struct(lit(c).as("column"), lit("row_count").as("metric"),
          col(s"${c}__row_count").as("value")),
        struct(lit(c).as("column"), lit("null_count").as("metric"),
          col(s"${c}__null_count").as("value")),
        struct(lit(c).as("column"), lit("approx_distinct").as("metric"),
          col(s"${c}__approx_distinct").as("value")),
        struct(lit(c).as("column"), lit("min").as("metric"),
          col(s"${c}__min").as("value")),
        struct(lit(c).as("column"), lit("max").as("metric"),
          col(s"${c}__max").as("value")),
        struct(lit(c).as("column"), lit("sum").as("metric"),
          col(s"${c}__sum").as("value")),
        struct(lit(c).as("column"), lit("mean").as("metric"),
          when(nonNull > 0, col(s"${c}__sum") / nonNull)
            .otherwise(lit(null)).as("value")))
    }
    one.select(explode(flatten(array(stacked: _*))).as("m"))
      .select(col("m.column"), col("m.metric"), col("m.value"))
  }

  /** One suggested constraint, with both a reporting row (column,
    * rule, lo, hi) and the executable [[DqRule]] it denotes. */
  final case class Suggestion(column: String, rule: String,
      lo: Option[Double], hi: Option[Double], dqRule: DqRule)

  /** Deequ-style constraint suggestion (ConstraintSuggestionRunner
    * analog): profile once, propose rules that HOLD on the profiled
    * frame by construction — the bootstrap for a DQ pipeline over a
    * table nobody has written rules for yet. Per numeric column:
    *
    *  - no nulls → `is_complete` ([[IsComplete]]); nulls present →
    *    `completeness` with threshold floor(observed·100)/100 − 0.01
    *    (strictly below the observed ratio — the rule's `passed` is a
    *    strict `>` — with one percentage point of headroom).
    *  - fully distinct AND complete → `unique_key` ([[UniqueKey]],
    *    EXACT distinct, not HLL — a suggestion that later gates a
    *    pipeline must not depend on sketch error).
    *  - `value_range` [min, max] ([[ColumnValues]] between).
    *  - `mean_in_range` with ±max(10% of |mean|, 0.01) headroom,
    *    rounded outward to 2 decimals ([[MeanInRange]]).
    *
    * All metrics come from ONE aggregation pass (the exact distincts
    * plan through Spark's Expand — one scan, `columns`-way row
    * duplication; fine for the handfuls of columns a suggestion run
    * targets). The collect is a single aggregate row. Every
    * suggested threshold derives from the collected doubles with
    * engine-neutral arithmetic (floor/ceil at 2 decimals), so an
    * oracle replaying the same fold emits bit-identical rows. */
  def suggestRules(df: DataFrame, columns: Seq[String]): Seq[Suggestion] = {
    val numeric = columns.filter(c =>
      df.schema(c).dataType.isInstanceOf[NumericType])
    require(numeric == columns,
      s"non-numeric columns requested: ${columns.diff(numeric)}")
    val aggs = columns.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        sum(col(c).cast(DecimalType(18, 2))).cast("double")
          .as(s"${c}__sm"))
    }
    // bounded collect: exactly one row of 6·|columns| scalars
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    def floor2(x: Double) = math.floor(x * 100) / 100
    def ceil2(x: Double) = math.ceil(x * 100) / 100
    columns.flatMap { c =>
      val n = row.getAs[Long](s"${c}__n")
      val nn = row.getAs[Long](s"${c}__nn")
      val nd = row.getAs[Long](s"${c}__nd")
      val complete =
        if (nn == n) Some(Suggestion(c, "is_complete", None, None,
          IsComplete(c)))
        else if (nn > 0) {
          val t = floor2(nn.toDouble / n.toDouble) - 0.01
          Some(Suggestion(c, "completeness", Some(t), None,
            Completeness(c, t)))
        } else None // all-null column: nothing defensible to suggest
      val unique = Option.when(nn == n && nd == nn)(
        Suggestion(c, "unique_key", None, None, UniqueKey(c)))
      val range = Option.when(nn > 0) {
        val (mn, mx) = (row.getAs[Double](s"${c}__mn"),
          row.getAs[Double](s"${c}__mx"))
        Suggestion(c, "value_range", Some(mn), Some(mx),
          ColumnValues(c, x => x >= mn && x <= mx))
      }
      val mean = Option.when(nn > 0) {
        val m = row.getAs[Double](s"${c}__sm") / nn.toDouble
        val pad = math.max(math.abs(m) * 0.1, 0.01)
        val (lo, hi) = (floor2(m - pad), ceil2(m + pad))
        Suggestion(c, "mean_in_range", Some(lo), Some(hi),
          MeanInRange(c, lo, hi))
      }
      complete.toSeq ++ unique ++ range ++ mean
    }
  }
}
