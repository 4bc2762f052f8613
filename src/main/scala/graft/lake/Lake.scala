package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Medallion-lake write layer: landing-zone raw writes plus the silver
  * layer's partitioned append-or-create tables.
  *
  * Reference provenance:
  *  - landing JSON overwrite write under `ingest_on=<d>/`:
  *    de-c4w4a2-api-extract-job.py:66-72
  *  - landing CSV write: de-c4w4a2-extract-songs-job.py:44-50
  *  - Iceberg `writeTo(...).partitionedBy("ingest_on").append()` /
  *    `.createOrReplace()` with a tableExists branch:
  *    de-c4w4a2-transform-json-job.py:147-187,
  *    de-c4w4a2-transform-songs-job.py:102-118
  *  - dynamic partition overwrite for idempotent backfills:
  *    transform-json-job.py:57
  *
  * No Iceberg jars ship offline, so the silver layer is partitioned
  * Parquet in the session catalog — identical append / create-or-replace
  * / dynamic-overwrite semantics for everything the reference exercises
  * (it never uses row-level deletes). At cluster scale the partition
  * column (`ingest_on`) keeps every incremental run confined to its own
  * partition directory: reruns rewrite one date, readers prune to one
  * date, and appends never rewrite history.
  */
object Lake {

  /** The conf the reference sets so re-runs replace only the partitions
    * they touch (idempotent backfill). */
  def enableDynamicPartitionOverwrite(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  /** Landing write: raw JSON, compacted to one file per ingest date
    * (small increments; the reference coalesces to 1 — api-extract-job
    * .py:66). For large increments pass a higher fileCount. */
  def writeLandingJson(df: DataFrame, basePath: String, ingestOn: String,
      fileCount: Int = 1): Unit =
    df.coalesce(fileCount).write.mode("overwrite")
      .json(s"$basePath/ingest_on=$ingestOn/")

  /** Landing write: raw CSV with header (extract-songs-job.py:44-50). */
  def writeLandingCsv(df: DataFrame, basePath: String, ingestOn: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .csv(s"$basePath/ingest_on=$ingestOn/")

  /** Catalog tables keep partition columns at the end of the schema;
    * align a frame to the table's column order before a positional
    * `insertInto`. */
  private def alignTo(spark: SparkSession, df: DataFrame,
      table: String): DataFrame =
    df.select(spark.table(table).columns.map(col).toIndexedSeq: _*)

  /** Silver-layer upsert-by-partition: append when the table exists,
    * create otherwise — the reference's K3/K4/K5 branch. (The V1
    * session catalog has no REPLACE TABLE AS SELECT, so this is the V1
    * writer; against an Iceberg/Delta catalog the same calls would go
    * through `writeTo(...).append()/createOrReplace()`.) */
  def appendOrCreate(spark: SparkSession, df: DataFrame, table: String,
      partitionCol: String = "ingest_on"): Unit =
    if (spark.catalog.tableExists(table))
      alignTo(spark, df, table).write.mode("append").format("parquet")
        .partitionBy(partitionCol).saveAsTable(table)
    else df.write.format("parquet").partitionBy(partitionCol)
      .saveAsTable(table)

  /** Idempotent incremental load: replace exactly the partitions present
    * in `df` (create the table on first run). Overwrite + dynamic
    * partition-overwrite mode rewrites only the `ingest_on` values in
    * `df` — what K1's overwrite + K6's dynamic mode jointly guarantee
    * in the reference. */
  def overwritePartitions(spark: SparkSession, df: DataFrame, table: String,
      partitionCol: String = "ingest_on"): Unit =
    if (spark.catalog.tableExists(table)) {
      enableDynamicPartitionOverwrite(spark)
      alignTo(spark, df, table).write.mode("overwrite").insertInto(table)
    } else df.write.format("parquet").partitionBy(partitionCol)
      .saveAsTable(table)

  /** Schema-evolving append: add any NEW columns in `df` to the table
    * first (ALTER TABLE ADD COLUMNS — metadata-only, no data rewrite;
    * history rows read the new columns as null), then append with the
    * table's full schema. The parquet-table equivalent of the Iceberg
    * v2 schema evolution the reference chose its format for; renames/
    * drops/type-changes need a real table format and are rejected
    * loudly rather than guessed. */
  def appendEvolved(spark: SparkSession, df: DataFrame, table: String,
      partitionCol: String = "ingest_on"): Unit = {
    if (!spark.catalog.tableExists(table)) {
      df.write.format("parquet").partitionBy(partitionCol)
        .saveAsTable(table)
      return
    }
    val existing = spark.table(table).schema
    val incoming = df.schema
    // name comparison mirrors Spark's default case-INsensitive
    // resolution: a case-variant of an existing column must append to
    // it, not trigger a doomed ALTER TABLE ADD COLUMNS
    val existingNames = existing.fieldNames.map(_.toLowerCase).toSet
    val incomingNames = incoming.fieldNames.map(_.toLowerCase).toSet
    val added = incoming.filterNot(f =>
      existingNames.contains(f.name.toLowerCase))
    val missingOk = existing.filterNot(f =>
      incomingNames.contains(f.name.toLowerCase)).forall(_.nullable)
    require(missingOk, s"append to $table drops non-nullable columns")
    if (added.nonEmpty) {
      val colsDdl = added.map(f => s"${f.name} ${f.dataType.sql}")
        .mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($colsDdl)")
    }
    val full = spark.table(table).columns
    val aligned = df.select(full.map(c =>
      if (incomingNames.contains(c.toLowerCase)) col(c)
      else org.apache.spark.sql.functions.lit(null)
        .cast(spark.table(table).schema(c).dataType).as(c)).toIndexedSeq: _*)
    aligned.write.mode("append").format("parquet")
      .partitionBy(partitionCol).saveAsTable(table)
  }

  /** Keyed upsert (MERGE emulation on a partitioned parquet table):
    * apply `updates` so the latest `versionCol` wins per `keyCols`.
    * Without Iceberg/Delta row-level ops, the scale-correct rewrite
    * unit is the PARTITION: only partitions present in `updates` are
    * read back (partition pruning via an IN filter on collected
    * partition values — small by construction: an incremental batch
    * touches few partitions), merged with a window-latest per key, and
    * rewritten under dynamic partition overwrite. Untouched partitions
    * are never read or written.
    *
    * Contract: a key's partition value is stable (updates arrive with
    * the same `partitionCol` value as the original row) — the usual
    * ingest-date model. Cross-partition key moves would need a full
    * key-index read, i.e. a real table format. The pre-write
    * materialization uses localCheckpoint (executor blocks); on a
    * production cluster prefer a reliable checkpoint/staging path. */
  def upsertByKey(spark: SparkSession, updates: DataFrame, table: String,
      keyCols: Seq[String], versionCol: String,
      partitionCol: String = "ingest_on"): Unit = {
    if (!spark.catalog.tableExists(table)) {
      updates.write.format("parquet").partitionBy(partitionCol)
        .saveAsTable(table)
      return
    }
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    val existing = spark.table(table)
      .filter(col(partitionCol).isin(touched.toIndexedSeq: _*))
    // deterministic tie-break: on EQUAL versions the incoming update
    // wins — producers that re-emit corrections without bumping the
    // version get reproducible "last writer wins" instead of an
    // arbitrary row_number pick that differs across retries
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__is_update").desc)
    val lit1 = org.apache.spark.sql.functions.lit(1)
    val lit0 = org.apache.spark.sql.functions.lit(0)
    val merged = alignTo(spark, updates, table).withColumn("__is_update", lit1)
      .unionByName(existing.withColumn("__is_update", lit0))
      .withColumn("__rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__is_update")
    enableDynamicPartitionOverwrite(spark)
    // materialize before overwriting: the merged plan reads the very
    // partitions the write replaces
    val staged = merged.localCheckpoint(true)
    alignTo(spark, staged, table).write.mode("overwrite").insertInto(table)
  }

  /** Bucketed catalog table: co-locates rows by hash of `bucketCol`
    * across `numBuckets` files per partition, so equi-joins and
    * aggregations on the bucket key read pre-shuffled data — at 100 TB
    * this converts every fact⋈fact join on the bucket key from a full
    * shuffle into a zero-exchange sort-merge join (see LakeSpec's plan
    * assertion). Sorting within buckets makes the merge side cheap. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** Serving-layer table materialization (dbt `table` → CTAS; K7). */
  def materializeTable(spark: SparkSession, df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(table)

  /** Serving-layer view materialization (dbt `view`; K8). */
  def materializeView(df: DataFrame, viewName: String): Unit =
    df.createOrReplaceTempView(viewName)
}
