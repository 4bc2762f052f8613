package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance for additive aggregate tables (the BI-view
  * shape: GROUP BY keys + SUM/COUNT measures).
  *
  * At 100 TB the serving aggregates must NOT be recomputed from full
  * history every window — additive measures merge: aggregate ONLY the
  * new increment, union with the existing aggregate table, and
  * re-aggregate the (tiny) union. Cost per refresh is O(increment) +
  * O(|aggregate|), independent of history size. Non-additive measures
  * (distinct counts, medians) need sketches or recompute — reject them
  * here rather than silently corrupt.
  */
object IncrementalAgg {

  /** Refresh `aggTable` with `increment` (raw rows, not aggregated):
    * result equals aggregating (history + increment) from scratch, for
    * SUM/COUNT measures declared in `sums`/`counts`. Creates the table
    * on first call. Sums ride DECIMAL(18,2) so merge order never
    * changes the result. */
  def refreshAdditive(spark: SparkSession, aggTable: String,
      increment: DataFrame, keyCols: Seq[String], sums: Seq[String],
      counts: Boolean = true): Unit = {
    require(keyCols.nonEmpty && (sums.nonEmpty || counts))
    val sumAggs = sums.map(c =>
      sum(col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as(s"sum_$c"))
    val cntAgg = if (counts) Seq(count(lit(1)).as("n")) else Seq.empty
    val aggs = sumAggs ++ cntAgg
    val incAgg = increment.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val merged =
      if (!spark.catalog.tableExists(aggTable)) incAgg
      else {
        // re-aggregate the union of two aggregates: SUM of sums, SUM of
        // counts — valid exactly because the measures are additive
        val reAggs = (sums.map(c =>
          sum(col(s"sum_$c")).as(s"sum_$c")) ++
          (if (counts) Seq(sum(col("n")).as("n")) else Seq.empty))
        spark.table(aggTable).unionByName(incAgg)
          .groupBy(keyCols.map(col): _*)
          .agg(reAggs.head, reAggs.tail: _*)
      }
    // durability: stage the merged result as its own catalog table
    // FIRST (a real parquet write, fault-tolerant), then rewrite the
    // main table from the staged copy. The overwrite's input is the
    // staged table, not the table being replaced (no lineage cycle,
    // no executor-memory checkpoint), and a crash mid-swap leaves the
    // staged table intact for recovery — this aggregate is by design
    // the only copy (no history to rebuild from).
    val stagedTable = s"${aggTable}__staged"
    merged.write.mode("overwrite").format("parquet")
      .saveAsTable(stagedTable)
    spark.table(stagedTable).write.mode("overwrite").format("parquet")
      .saveAsTable(aggTable)
  }
}
