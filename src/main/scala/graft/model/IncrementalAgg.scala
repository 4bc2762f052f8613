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

  private val GenProp = "graft.generation"
  private val IncProp = "graft.increment"

  private def tableProps(spark: SparkSession,
      table: String): Map[String, String] =
    if (!spark.catalog.tableExists(table)) Map.empty
    else spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier(table))
      .properties

  /** The staged/main generation counter: table property `graft.generation`,
    * set only AFTER the corresponding data write fully succeeded. A
    * missing table or property reads as generation 0, so a half-written
    * table (crash mid-write drops/recreates without the property) is
    * indistinguishable from an old one — exactly what recovery wants. */
  private def generation(spark: SparkSession, table: String): Long =
    tableProps(spark, table).get(GenProp).map(_.toLong).getOrElse(0L)

  private def setGeneration(spark: SparkSession, table: String,
      gen: Long, incrementId: Option[String]): Unit = {
    val inc = incrementId.map(i =>
      s", '$IncProp'='${i.replace("'", "''")}'").getOrElse("")
    spark.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES ('$GenProp'='$gen'$inc)")
  }

  private def incrementOf(spark: SparkSession, table: String): Option[String] =
    tableProps(spark, table).get(IncProp)

  /** Refresh `aggTable` with `increment` (raw rows, not aggregated):
    * result equals aggregating (history + increment) from scratch, for
    * SUM/COUNT measures declared in `sums`/`counts`. Creates the table
    * on first call. Sums ride DECIMAL(18,2) so merge order never
    * changes the result.
    *
    * Crash safety: the merged result is staged as `aggTable__staged`
    * first, then swapped into `aggTable`, with a generation counter in
    * table properties stamped after each successful write. On entry,
    * a staged generation AHEAD of the main table means a previous run
    * crashed mid-swap — the staged copy is then the ONLY copy of that
    * increment's merge, so the swap is completed before anything
    * overwrites it. Every crash point re-runs to a consistent state:
    * crash before staged's stamp → staged is stale, safely rebuilt;
    * crash after stamp (mid-swap or before main's stamp) → recovery
    * finishes the idempotent swap.
    *
    * At-least-once callers MUST pass `incrementId` (the window label —
    * e.g. "2020-03"): it is stamped alongside the generation, and a
    * retry of the SAME increment after any crash point is then exactly
    * once — if the staged or main table already carries this id, the
    * increment is already merged there and the call completes the swap
    * (or no-ops) instead of applying it twice. Without an id a retry
    * after a crash-after-stage would double-count the increment
    * (recovery has no way to know the staged merge already contains
    * it). Only the LATEST increment's id is tracked, so retries must
    * be of the most recent window — the sequential one-active-run
    * orchestration model (the reference's `max_active_runs=1`). */
  def refreshAdditive(spark: SparkSession, aggTable: String,
      increment: DataFrame, keyCols: Seq[String], sums: Seq[String],
      counts: Boolean = true, incrementId: Option[String] = None): Unit = {
    require(keyCols.nonEmpty && (sums.nonEmpty || counts))
    val stagedTable = s"${aggTable}__staged"
    // exactly-once fast paths for identified increments
    if (incrementId.isDefined) {
      if (incrementOf(spark, aggTable) == incrementId) return // applied
      if (incrementOf(spark, stagedTable) == incrementId &&
          generation(spark, stagedTable) > generation(spark, aggTable)) {
        // crashed after staging THIS increment: the staged copy already
        // contains its merge — finish the swap, do NOT merge again
        recoverIfCrashed(spark, aggTable)
        return
      }
    }
    recoverIfCrashed(spark, aggTable)
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
    // no executor-memory checkpoint).
    val nextGen = generation(spark, aggTable) + 1
    merged.write.mode("overwrite").format("parquet")
      .saveAsTable(stagedTable)
    setGeneration(spark, stagedTable, nextGen, incrementId)
    spark.table(stagedTable).write.mode("overwrite").format("parquet")
      .saveAsTable(aggTable)
    setGeneration(spark, aggTable, nextGen, incrementId)
  }

  /** Detect and repair a crash between staging and swap: if the staged
    * table's generation is ahead of the main table's, the staged copy
    * holds a merge the main table never received — finish the swap
    * (idempotent: re-running after another crash repeats it). Public
    * so operators can also run it standalone after an incident. */
  def recoverIfCrashed(spark: SparkSession, aggTable: String): Unit = {
    val stagedTable = s"${aggTable}__staged"
    val stagedGen = generation(spark, stagedTable)
    val mainGen = generation(spark, aggTable)
    if (stagedGen > mainGen) {
      spark.table(stagedTable).write.mode("overwrite").format("parquet")
        .saveAsTable(aggTable)
      setGeneration(spark, aggTable, stagedGen,
        incrementOf(spark, stagedTable))
    }
  }
}
