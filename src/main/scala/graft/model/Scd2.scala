package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 — the dbt `snapshot` analog. The
  * reference's modeling layer is dbt over a warehouse
  * (dbt_modeling/dbt_project.yml); dbt's fourth core materialization
  * is the snapshot: track each key's attribute changes over time as
  * versioned rows with validity intervals. Two entry points:
  *
  *  - [[historize]] builds the full history in ONE pass from a change
  *    log (the backfill / initial-load shape);
  *  - [[snapshotMerge]] advances an existing SCD2 table by one
  *    snapshot of the source (dbt's `timestamp` strategy — the
  *    incremental shape [[ModelRunner]] drives for
  *    `materialized='snapshot'` models).
  *
  * Scale shape: historize is two window passes over the change log,
  * partitioned by the dimension key — one shuffle on the key, no
  * joins. snapshotMerge joins ONLY the open (current) slice against
  * the incoming snapshot on the key; closed history rows pass through
  * untouched (and under a partitioned table layout —
  * e.g. `is_current` — they are never even read).
  */
object Scd2 {

  /** Collapse a change log into SCD2 version rows.
    *
    * Rows are ordered per key by `tsCol` (+ `tieCols` for a total
    * order); consecutive rows whose `stateCols` are unchanged
    * (null-safe) collapse into one version. Output: the key columns,
    * `version` (1-based per key), the state columns,
    * `valid_from`/`valid_to` (from `tsCol`; open version has NULL
    * `valid_to`), `is_current`.
    */
  def historize(changes: DataFrame, keyCols: Seq[String],
      stateCols: Seq[String], tsCol: String,
      tieCols: Seq[String] = Seq.empty): DataFrame = {
    require(keyCols.nonEmpty && stateCols.nonEmpty, "need keys and state")
    val order = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    // a row opens a new version when any state column differs from the
    // previous row's (null-safe), or when it is the key's first row
    val anyDiff = stateCols
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduceLeft(_ || _)
    val marked = changes.withColumn("_rn", row_number().over(w))
      .withColumn("_chg", col("_rn") === 1 || anyDiff)
    val versions = marked.filter(col("_chg"))
    val wv = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    versions.select(
      keyCols.map(col) ++
        Seq(row_number().over(wv).as("version")) ++
        stateCols.map(col) ++ Seq(
          col(tsCol).as("valid_from"),
          lead(col(tsCol), 1).over(wv).as("valid_to"),
          lead(col(tsCol), 1).over(wv).isNull.as("is_current")): _*)
  }

  /** Advance an SCD2 table by one source snapshot (dbt `timestamp`
    * strategy). `current` carries the business columns plus
    * `dbt_valid_from`/`dbt_valid_to`; `updates` carries exactly the
    * business columns. A key's open row is superseded when the
    * incoming `updatedAt` is strictly newer than its
    * `dbt_valid_from`; unseen keys insert as new open rows; closed
    * history passes through untouched. `updates` must be unique per
    * `uniqueKey` (dbt's snapshot contract) — duplicates fail loudly
    * rather than writing a nondeterministic history.
    */
  def snapshotMerge(current: DataFrame, updates: DataFrame,
      uniqueKey: String, updatedAt: String): DataFrame = {
    val bizCols = current.columns
      .filterNot(c => c == "dbt_valid_from" || c == "dbt_valid_to").toSeq
    require(updates.columns.toSeq.sorted == bizCols.sorted,
      s"snapshot source columns ${updates.columns.toSeq.sorted} must match " +
        s"the snapshot's business columns ${bizCols.sorted}")
    val dupes = updates.groupBy(col(uniqueKey)).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupes == 0,
      s"snapshot source has duplicate $uniqueKey values — dbt snapshot " +
        "semantics need one row per key")

    val closed = current.filter(col("dbt_valid_to").isNotNull)
    val open = current.filter(col("dbt_valid_to").isNull)
    val u = updates.select(bizCols.map(c => col(c).as(s"_u_$c")): _*)
    val j = open.join(u, col(uniqueKey) === col(s"_u_$uniqueKey"), "full_outer")
    val supersedes = col(s"_u_$uniqueKey").isNotNull &&
      col(uniqueKey).isNotNull &&
      col(s"_u_$updatedAt") > col("dbt_valid_from")
    // surviving prior rows: open rows, closed at the update's
    // timestamp when superseded
    val prior = j.filter(col(uniqueKey).isNotNull).select(
      bizCols.map(col) ++ Seq(col("dbt_valid_from"),
        when(supersedes, col(s"_u_$updatedAt"))
          .otherwise(lit(null).cast(current.schema("dbt_valid_to").dataType))
          .as("dbt_valid_to")): _*)
    // new open rows: superseded keys' fresh values + brand-new keys
    val fresh = j.filter(supersedes || col(uniqueKey).isNull).select(
      bizCols.map(c => col(s"_u_$c").as(c)) ++ Seq(
        col(s"_u_$updatedAt").as("dbt_valid_from"),
        lit(null).cast(current.schema("dbt_valid_to").dataType)
          .as("dbt_valid_to")): _*)
    val outCols = current.columns.toSeq
    closed.select(outCols.map(col): _*)
      .unionByName(prior.select(outCols.map(col): _*))
      .unionByName(fresh.select(outCols.map(col): _*))
  }
}
