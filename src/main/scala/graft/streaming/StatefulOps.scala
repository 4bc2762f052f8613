package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Stateful streaming operators on the Spark 4 arbitrary-state API
  * (`KeyValueGroupedDataset.transformWithState` + `StatefulProcessor`
  * — the successor of `flatMapGroupsWithState`, backed by the RocksDB
  * state store with per-state TTL). Where `StreamingIngest.sessionize`
  * demonstrates the classic GroupState path, this module uses the
  * modern API: typed state handles created in `init`, optional TTL so
  * state expires without hand-rolled timer bookkeeping, and state
  * kept OFF the JVM heap — at ingest scale the state store holds one
  * counter per key, and RocksDB keeps executor heap flat no matter
  * how many keys accumulate.
  *
  * Requires `spark.sql.streaming.stateStore.providerClass` =
  * RocksDBStateStoreProvider (the HDFS-backed default store does not
  * support transformWithState).
  */
object StatefulOps {

  /** Emit at most `maxPerKey` rows per key over the stream's lifetime
    * (or per TTL window when `ttl` is set): the streaming face of
    * per-source contribution capping — a training-data ingest quota
    * that stops one domain/source from flooding the corpus, applied
    * online instead of by a post-hoc `lang_rebalance`-style batch
    * pass. State per key is ONE long (rows already admitted), so
    * memory is O(distinct keys) regardless of stream length; with a
    * TTL the quota becomes "per key per window" and even that counter
    * set stays bounded by key churn.
    *
    * Admission within a micro-batch follows the iterator order Spark
    * hands the processor — like any online quota, WHICH rows are
    * admitted under contention is arrival-order dependent; the
    * guarantee is the cap itself. */
  final class CapPerKeyProcessor[K, V](maxPerKey: Long, ttl: TTLConfig)
      extends StatefulProcessor[K, V, V] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(key: K, rows: Iterator[V],
        timers: TimerValues): Iterator[V] = {
      val already = if (seen.exists()) seen.get() else 0L
      val room = math.max(0L, maxPerKey - already)
      // bounded by maxPerKey, so the buffer is small by construction;
      // materializing lets the admitted count land in state before
      // the sink consumes the iterator
      val admitted = rows.take(math.min(room, Int.MaxValue.toLong).toInt)
        .toVector
      if (admitted.nonEmpty) seen.update(already + admitted.size)
      admitted.iterator
    }
  }

  /** [[CapPerKeyProcessor]] applied to a stream: keeps the first
    * `maxPerKey` rows per `keyFn` key, drops the rest. `ttl` (state
    * time-to-live, processing-time based) turns the lifetime cap into
    * a rolling-window cap. */
  def capPerKey[K, V](ds: Dataset[V], keyFn: V => K, maxPerKey: Long,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit ke: Encoder[K], ve: Encoder[V]): Dataset[V] = {
    require(maxPerKey > 0, s"maxPerKey must be positive, got $maxPerKey")
    ds.groupByKey(keyFn)
      .transformWithState(new CapPerKeyProcessor[K, V](maxPerKey, ttl),
        TimeMode.None(), OutputMode.Append())
  }
}
