package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Input/output rows for [[sessionizeWithTimers]]. */
  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** Gap sessionization on the modern timer API — the
    * `transformWithState` successor of `StreamingIngest.sessionize`'s
    * classic GroupState path. A session CLOSED by a later event in
    * the same or a later batch is emitted immediately; the LAST open
    * session per key is finalized by an EVENT-TIME TIMER registered
    * at `end + gap` — it fires when the watermark passes that point,
    * so no session waits for another event to flush (the classic
    * path's known wart). State per key is one (start, end, n) triple
    * plus one registered timer; both clear on emission.
    *
    * Semantics note: events are gap-merged in timestamp order WITHIN
    * a batch; an out-of-order event arriving after its session's
    * timer already fired (i.e. later than the watermark allows)
    * starts a fresh session — standard watermark-bounded behavior. */
  final class TimerSessionizeProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessEvent, SessionOut] {
    @transient private var sess: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessEvent],
        timers: TimerValues): Iterator[SessionOut] = {
      // micro-batch arrival order is arbitrary: sort the batch's
      // timestamps (bounded by per-key batch volume) and gap-merge
      val ts = rows.map(_.ts.getTime).toArray.sorted
      var out = Vector.empty[SessionOut]
      var open: Option[(Long, Long, Long)] =
        if (sess.exists()) Some(sess.get()) else None
      // the open session's finalize-timer moves with its end: drop
      // the old registration before extending
      open.foreach(o => getHandle.deleteTimer(o._2 + gapMs))
      ts.foreach { t =>
        open = open match {
          case Some((s0, e0, n0)) if t <= e0 + gapMs =>
            Some((math.min(s0, t), math.max(e0, t), n0 + 1))
          case Some((s0, e0, n0)) =>
            out :+= SessionOut(key, s0, e0, n0)
            Some((t, t, 1L))
          case None => Some((t, t, 1L))
        }
      }
      open.foreach { o =>
        sess.update(o)
        getHandle.registerTimer(o._2 + gapMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!sess.exists()) return Iterator.empty
      val (s0, e0, n0) = sess.get()
      // guard stale registrations: only the timer matching the OPEN
      // session's current expiry finalizes it
      if (expiredTimerInfo.getExpiryTimeInMs() >= e0 + gapMs) {
        sess.clear()
        Iterator.single(SessionOut(key, s0, e0, n0))
      } else Iterator.empty
    }
  }

  /** [[TimerSessionizeProcessor]] applied to a stream of
    * (user_id, ts): watermark-driven gap sessions, the last open
    * session flushed by its event-time timer instead of waiting for
    * more traffic. */
  def sessionizeWithTimers(ds: Dataset[SessEvent], gapMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionizeProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Input/output rows for [[funnelProgress]]. */
  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  final case class FunnelHit(user_id: Long, stage: Int, ts_ms: Long)
  private final case class FunnelState(times: Seq[Long])

  /** Online ordered-funnel state machine: per key, advance through
    * `stages` (stage i completes on the FIRST event of its type
    * strictly after the recorded stage-(i-1) time) and emit one
    * [[FunnelHit]] the moment a stage completes — the streaming face
    * of the batch `q_funnel_steps` windows, for live conversion
    * dashboards. State per key is one fixed-width long vector
    * (completed-stage timestamps), so the store is O(keys · stages)
    * no matter how long the stream runs.
    *
    * Online semantics, stated plainly: each batch's rows are
    * processed in timestamp order (sorted here — batch arrival order
    * is arbitrary), but completed stages never retract. An
    * out-of-order event landing in a LATER batch can still complete
    * the next stage if its timestamp qualifies; it cannot lower an
    * already-recorded stage time (the batch funnel, seeing all
    * history at once, could — the divergence window is exactly
    * cross-batch reordering, the standard online-funnel contract). */
  final class FunnelProcessor(stages: IndexedSeq[String])
      extends StatefulProcessor[Long, FunnelEvent, FunnelHit] {
    @transient private var reached: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      reached = getHandle.getValueState("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        timers: TimerValues): Iterator[FunnelHit] = {
      val cur: Array[Long] =
        if (reached.exists()) reached.get().times.toArray
        else Array.fill(stages.length)(-1L)
      val out = Vector.newBuilder[FunnelHit]
      var dirty = false
      rows.toVector
        .sortBy(e => (e.ts.getTime, e.event_type))
        .foreach { e =>
          val i = stages.indexOf(e.event_type)
          if (i >= 0 && cur(i) < 0 &&
              (i == 0 || (cur(i - 1) >= 0 && e.ts.getTime > cur(i - 1)))) {
            cur(i) = e.ts.getTime
            dirty = true
            out += FunnelHit(key, i, cur(i))
          }
        }
      if (dirty) reached.update(FunnelState(cur.toSeq))
      out.result().iterator
    }
  }

  /** [[FunnelProcessor]] applied to a stream. */
  def funnelProgress(ds: Dataset[FunnelEvent],
      stages: Seq[String]): Dataset[FunnelHit] = {
    require(stages.nonEmpty && stages.distinct == stages,
      s"stages must be non-empty and distinct: $stages")
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[FunnelHit] = Encoders.product[FunnelHit]
    ds.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(stages.toIndexedSeq),
        TimeMode.None(), OutputMode.Append())
  }
}
