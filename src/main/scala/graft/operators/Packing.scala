package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — laying documents head-to-tail into fixed-size
  * context windows — is the last batch step of an LLM training-data
  * pipeline (after dedup/filter/split, before tokenizer export).
  * Two policies, both deterministic at any parallelism:
  *
  *  - [[packSequential]]: the GPT-style token-stream cut. Documents
  *    concatenate in id order within a shard; the stream is cut every
  *    `capacity` tokens; a document belongs to the window its first
  *    token lands in (long documents span windows — the usual
  *    "documents may cross sequence boundaries" training regime).
  *    Pure window functions ⇒ SQL-expressible, hash-oracled.
  *
  *  - [[packGreedy]]: bin packing where a document is never split —
  *    the window closes when the next document would overflow.
  *    Inherently sequential per shard (each assignment depends on the
  *    running fill), so it runs as a sorted per-group fold
  *    (flatMapGroups), not a window function.
  *
  * Scale shape: both partition by a shard column — the unit of
  * parallelism a 100 TB corpus is already organized around (source,
  * date, hash bucket). Nothing is global: one shuffle on the shard
  * key, a per-shard sort, a linear pass. A single global ORDER BY
  * would serialize the corpus through one partition; sharded packing
  * is how production pipelines do it (each shard becomes its own
  * stream of training sequences).
  */
object Packing {

  /** Token-stream packing: returns one row per document with its
    * shard, start offset in the shard's concatenated token stream,
    * and the index of the capacity-sized window containing its first
    * token. */
  def packSequential(df: DataFrame, idCol: String, tokensCol: String,
      capacity: Int, shardCol: String): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(shardCol).as("shard"), col(idCol),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("window_idx",
        floor(col("start_offset") / capacity).cast("long"))
  }

  /** Whole-document bin packing: within each shard (id order), keep a
    * running fill; a document that would overflow `capacity` opens the
    * next window. Documents longer than the capacity get a window of
    * their own (they can't fit anywhere — flagged `oversize`).
    * Returns (shard, id, n_tokens, window_idx, window_fill, oversize)
    * where `window_fill` is the window's running total AFTER placing
    * the document. */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
      capacity: Int, shardCol: String): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = df.sparkSession
    val in = df.select(
      col(shardCol).cast("string").as("shard"),
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("n_tokens"))
    val outSchema = StructType(Seq(
      StructField("shard", StringType),
      StructField("id", LongType),
      StructField("n_tokens", LongType),
      StructField("window_idx", LongType),
      StructField("window_fill", LongType),
      StructField("oversize", BooleanType)))
    import spark.implicits._
    val packed = in.as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, rows) =>
        // sort in memory: a shard is ONE packing stream — bounded by
        // shard granularity, which the caller controls (that is the
        // operator's documented contract; use a finer shard key for
        // bigger corpora, exactly like choosing a partition count)
        val docs = rows.toIndexedSeq.sortBy(_._2)
        var window = 0L
        var fill = 0L
        var opened = false
        docs.iterator.map { case (_, id, n) =>
          val oversize = n > capacity
          if (!opened) { opened = true; fill = n }
          else if (fill + n > capacity) { window += 1; fill = n }
          else fill += n
          Row(shard, id, n, window, fill, oversize)
        }
      }(Encoders.row(outSchema))
    packed
  }
}
