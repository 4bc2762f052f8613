package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Volume anomaly detection — the data-quality axis the rule DSL
  * ([[Dqdl]]) can't express: instead of a fixed threshold, each
  * partition's row count is judged against the DISTRIBUTION of all
  * partition counts (Glue DQ's anomaly-detection capability, applied
  * to ingest volumes; reference context: the per-window ingest DAGs in
  * dags/deftunes_api_pipeline.py land one partition per run — a
  * half-empty or double-loaded run is exactly what this catches).
  *
  * Deterministic at any parallelism: counts are exact integers, the
  * mean and variance come from exact DECIMAL sums with ONE double
  * division each (the [[Dqdl]] StandardDeviation discipline), and the
  * z-score is a fixed-order double expression quantized through
  * DECIMAL(18,9) — bit-replayable in the DuckDB oracle.
  *
  * Scale shape: one count aggregation on the partition key, a 1-row
  * stats aggregate broadcast back — two tiny shuffles regardless of
  * table size; nothing driver-side.
  */
object Anomaly {

  /** Per-partition row counts flagged by |z| ≥ `zThreshold` against
    * the population mean/std of all partition counts. Output:
    * (partition value, cnt, z, is_anomaly), z NULL when the counts
    * are constant (std = 0). */
  def volumeByPartition(df: DataFrame, partCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    val counts = df.groupBy(col(partCol)).agg(count(lit(1)).as("cnt"))
    // the square is computed IN decimal: cnt*cnt as a long overflows
    // silently past ~3e9 rows per partition — real at 100 TB.
    // DECIMAL(19,0)² → DECIMAL(38,0) on both engines.
    val cntDec = col("cnt").cast(DecimalType(19, 0))
    val stats = counts.agg(
      count(lit(1)).as("n"),
      sum(col("cnt").cast(DecimalType(28, 0))).as("s"),
      sum((cntDec * cntDec).cast(DecimalType(38, 0))).as("ss"))
    // fixed-order float recipe, mirrored textually in the oracle:
    //   mean = s/n ; var = ss/n - mean*mean ; std = sqrt(var)
    //   z = (cnt - mean) / std
    val nD = col("n").cast("double")
    val mean = col("s").cast("double") / nD
    val variance = col("ss").cast("double") / nD - mean * mean
    val std = sqrt(variance)
    val z = (col("cnt").cast("double") - mean) / std
    counts.crossJoin(broadcast(stats))
      .select(col(partCol), col("cnt"),
        when(std > 0.0, z.cast(DecimalType(18, 9)).cast("double"))
          .as("z"),
        when(std > 0.0, abs(z) >= lit(zThreshold)).otherwise(lit(false))
          .as("is_anomaly"))
  }
}
