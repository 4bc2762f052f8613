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
}
