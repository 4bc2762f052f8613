package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming flavor of the reference's incremental ingest.
  *
  * The reference emulates a stream with monthly Airflow windows over
  * landing files (SURVEY.md §2.7 — no true streaming exists there).
  * This module is the beyond-reference upgrade: the same landing
  * directory consumed as a file stream, with watermarked event-time
  * windows and a stateful sessionizer. `Trigger.AvailableNow` gives
  * exactly the reference's batch semantics (drain everything that has
  * landed, then stop) while keeping checkpointed exactly-once progress
  * — at scale this replaces the "rerun the month" model with
  * incremental file discovery.
  */
object StreamingIngest {

  /** Landing-zone JSON as a stream. Schema is mandatory (streaming
    * reads don't infer), which also pins the silver contract. */
  def readLandingStream(spark: SparkSession, basePath: String,
      schema: StructType, maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(basePath)

  /** Watermarked tumbling-window aggregation over an event-time
    * column: counts + value sum per (window, event_type). Late rows
    * beyond the watermark are dropped — state is bounded, which is
    * what makes this runnable forever at scale.
    *
    * Append-mode emission gotcha: a window only emits after the
    * watermark passes its end, and the watermark advances BETWEEN
    * microbatches — an `AvailableNow` drain that fits in one batch
    * emits nothing. For batch-style drains either lower
    * `maxFilesPerTrigger` (so the watermark advances across batches)
    * or use the batch equivalent (SparkEntry `q_event_window_agg`). */
  def windowedEventAgg(events: DataFrame, tsCol: String = "ts",
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("total"))

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, events: Long,
      total_value: Double, started: java.sql.Timestamp,
      ended: java.sql.Timestamp)
  private final case class SessionState(events: Long, total: Double,
      started: Long, last: Long)

  /** Custom session windows via flatMapGroupsWithState: a user's
    * session closes after `gapMs` of inactivity and emits one summary
    * row. State per key is O(1) — the canonical bounded-state stateful
    * operator. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.events, s.total,
              new java.sql.Timestamp(s.started), new java.sql.Timestamp(s.last)))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last > gapMs =>
                  out += SessionSummary(userId, s.events, s.total,
                    new java.sql.Timestamp(s.started),
                    new java.sql.Timestamp(s.last))
                  cur = Some(SessionState(1L, e.value, t, t))
                case Some(s) =>
                  cur = Some(s.copy(events = s.events + 1,
                    total = s.total + e.value, last = t))
                case None =>
                  cur = Some(SessionState(1L, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // batch execution has no watermark — timeout registration
              // only applies on a true stream
              scala.util.Try(state.setTimeoutTimestamp(s.last + gapMs))
            }
            out.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join: pair each left row with
    * the right rows sharing its key whose event time falls in
    * `[leftTs, leftTs + maxGap]` — the click→conversion /
    * impression→attribution shape. Both sides carry watermarks and the
    * join predicate carries an explicit event-time range, which is
    * what lets Spark derive a state watermark PER SIDE and evict
    * buffered rows once they can no longer match — state is
    * O(watermark window), not O(stream history), the property that
    * makes the join runnable forever at ingest scale. Inner matches
    * emit as soon as both rows have arrived; outer-join non-matches
    * (joinType "leftOuter"/"rightOuter"/"fullOuter") emit only after
    * the watermark proves no match can still arrive.
    *
    * Column names must be disjoint across the two sides apart from
    * the join key/ts columns referenced here (rename upstream — the
    * output carries both sides' columns unqualified). */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      maxGap: String, watermark: String = "1 day",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxGap"),
      joinType)
  }

  /** Stream-static enrichment join: every micro-batch joins against
    * the (non-streaming) dimension side, broadcast so the stream
    * never shuffles — the streaming face of the reference's
    * fact→dim_* joins (SURVEY §2.4). Left-outer by default: an
    * unmatched stream row must not be dropped by enrichment. The
    * static side is planned per micro-batch, so a dim small enough to
    * broadcast stays a map-side join for the stream's whole
    * lifetime. */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      keys: Seq[String], joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Streaming exact dedup on key columns, state bounded by the
    * watermark: a duplicate arriving within `watermark` of the first
    * occurrence is dropped; state for a key is evicted once the
    * watermark passes it. This is the streaming face of
    * `Dedup.exactDedup` — at ingest scale it prevents re-delivered
    * landing records (at-least-once sources) from reaching the silver
    * layer, with O(active window keys) state instead of O(history). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream → silver catalog table via foreachBatch: each micro-batch
    * lands with the lake's dynamic-partition-overwrite semantics, so
    * the streaming path and the batch path produce the SAME table
    * layout (partition pruning, schema, catalog entry). Checkpointed
    * source progress + partition overwrite per batch give effective
    * exactly-once for file sources: a batch replayed after a crash
    * rewrites exactly its own partitions instead of duplicating rows.
    *
    * Contract: one `partitionCol` value must not span micro-batches
    * (or a later batch would overwrite an earlier one's rows) — true
    * for the reference's shape where a drain covers whole ingest
    * dates; set maxFilesPerTrigger accordingly. The partition column
    * must exist on the stream (added at read time, as the reference's
    * transform jobs do). */
  /** Drain a COMPLETE-mode streaming aggregation with AvailableNow
    * and persist its final state to parquet. Memory sink, because the
    * file sinks accept only append mode; the temp view is dropped
    * after the copy. For aggregates whose value is order- and
    * merge-independent (counts, decimal sums, KMV sketches) the
    * drained state equals the batch result EXACTLY — the streaming
    * path becomes oracle-checkable, not just smoke-testable. The
    * aggregation state (including custom TypedImperativeAggregate
    * buffers) round-trips the state store between microbatches, so a
    * multi-file source exercises serialize/deserialize for real. */
  def drainCompleteToParquet(agg: DataFrame, spark: SparkSession,
      outPath: String): Unit = {
    val name = "graft_complete_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).write.mode("overwrite").parquet(outPath)
    spark.catalog.dropTempView(name)
    ()
  }

  def sinkToSilver(df: DataFrame, spark: SparkSession, table: String,
      checkpoint: String, partitionCol: String = "ingest_on"): Unit = {
    // Runtime guard for the one-partition-one-batch contract: if a
    // partition value reappears in a DIFFERENT batch, the dynamic
    // overwrite would silently discard the earlier batch's rows —
    // fail loudly instead (resize maxFilesPerTrigger or pre-bucket
    // the landing files by date). Drained values are persisted under
    // the checkpoint dir (one ledger file per batchId), so the guard
    // holds ACROSS drains sharing a checkpoint — e.g. late-arriving
    // files for an already-landed partition picked up by a later run.
    // A crash-replayed batch rewrites exactly its own ledger entry
    // (same batchId → same partitions → idempotent), so replays pass.
    val ledger = new PartitionLedger(spark, checkpoint)
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        val parts = batch.select(partitionCol).distinct()
          .collect().map(_.get(0)).toSet
        val overlap = ledger.overlap(batchId, parts)
        require(overlap.isEmpty,
          s"partition value(s) $overlap were already landed by an " +
            "earlier micro-batch (possibly a previous drain of this " +
            "checkpoint) — overwriting would drop its rows; lower the " +
            "ingest granularity, raise maxFilesPerTrigger, or use a " +
            "fresh silver table + checkpoint for backfills")
        graft.lake.Lake.overwritePartitions(spark, batch, table,
          partitionCol)
        // record AFTER the write: a crash in between replays the batch,
        // which re-records the same values under the same batchId
        ledger.record(batchId, parts)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Durable ledger of partition values drained by [[sinkToSilver]],
    * one file per micro-batch under `<checkpoint>/graft_partitions/`.
    * Lives with the checkpoint (same filesystem — HDFS/S3A/local), so
    * its lifetime matches the source-progress state: delete the
    * checkpoint to reset both. Values are URL-encoded one-per-line;
    * nulls ride a sentinel. */
  private[graft] final class PartitionLedger(spark: SparkSession,
      checkpoint: String) {
    import org.apache.hadoop.fs.Path
    private val dir = new Path(checkpoint, "graft_partitions")
    private val fs = dir.getFileSystem(
      spark.sessionState.newHadoopConf())

    // non-null values get a "v:" prefix before encoding so the bare
    // "null" sentinel can never collide with a real value
    private def enc(v: Any): String =
      if (v == null) "null"
      else "v:" + java.net.URLEncoder.encode(v.toString, "UTF-8")

    // ledger files are read ONCE per drain (at first use) and kept
    // current in memory as batches record — re-listing and re-reading
    // every file per batch would be O(batches²) filesystem reads over
    // a long drain. The files remain the source of truth across runs.
    private lazy val byBatch: scala.collection.mutable.Map[Long, Set[String]] =
      scala.collection.mutable.Map.empty[Long, Set[String]] ++ (
        if (!fs.exists(dir)) Nil
        else fs.listStatus(dir).iterator
          .filter(s => s.isFile &&
            s.getPath.getName.matches("batch-\\d+"))
          .map { s =>
            val id = s.getPath.getName.stripPrefix("batch-").toLong
            val in = fs.open(s.getPath)
            val lines =
              try scala.io.Source.fromInputStream(in, "UTF-8")
                .getLines().toSet
              finally in.close()
            id -> lines
          }.toList)

    /** Members of `parts` already recorded by any batch EXCEPT
      * `batchId` (a replay of batchId overwrites its own partitions —
      * that's idempotent, not a conflict). */
    def overlap(batchId: Long, parts: Set[Any]): Set[Any] = {
      val seen = byBatch.collect {
        case (id, vs) if id != batchId => vs
      }.foldLeft(Set.empty[String])(_ union _)
      parts.filter(p => seen.contains(enc(p)))
    }

    def record(batchId: Long, parts: Set[Any]): Unit = {
      val encoded = parts.map(enc)
      val out = fs.create(new Path(dir, s"batch-$batchId"), true)
      try out.write(encoded.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      byBatch(batchId) = encoded
    }
  }

  /** Streaming incremental corpus ingestion: every micro-batch
    * appends only never-seen-before documents via
    * [[graft.pipeline.Curation.appendNovel]] (within-batch exact
    * dedup + anti-join against the corpus table's full fingerprint
    * history). Effectively exactly-once WITHOUT a ledger: a
    * crash-replayed batch finds its own fingerprints already in the
    * table, the anti-join drops every row, and the replay appends
    * nothing — the dedup is the idempotence mechanism, which is why
    * this sink (unlike [[sinkToSilver]]) needs no one-partition-per-
    * batch contract. */
  def ingestNovel(docs: DataFrame, spark: SparkSession, table: String,
      checkpoint: String, idCol: String = "doc_id",
      textCol: String = "text",
      partitionCol: String = "ingest_on"): Unit = {
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        graft.pipeline.Curation.appendNovel(spark, batch, table,
          idCol, textCol, partitionCol)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain everything currently in the source, write to a parquet
    * sink, stop — the reference's "process this month's landing files"
    * as a checkpointed streaming run. */
  def runAvailableNow(df: DataFrame, outPath: String,
      checkpoint: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
