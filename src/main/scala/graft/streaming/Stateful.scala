package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators via `flatMapGroupsWithState` — the custom-
  * state surface Structured Streaming offers beyond windows/watermarks.
  * Two pipeline staples:
  *
  *  - [[dedupedEvents]]: per-key streaming exact-dedup (emit an event id
  *    the first time it is seen within a key) — the streaming counterpart
  *    of the batch exact-dedup operator, used to make at-least-once event
  *    delivery idempotent before it reaches scoring.
  *  - [[runningCounts]]: per-key running counters with timeout-based state
  *    expiry — the streaming form of the hot-books popularity counter.
  *
  * State is per-key and partitioned by the shuffle — at 100 TB of events
  * the state store shards across executors; the timeout bounds its size.
  */
object Stateful {

  final case class KeyedEvent(key: Long, eventId: Long)
  final case class CountUpdate(key: Long, count: Long)

  /** Emit (key, eventId) only on first sight of eventId within key.
    * State: the set of seen ids per key, capped at `maxSeen` (oldest
    * dropped) AND expired after `timeoutMs` of processing-time key
    * inactivity when > 0 — maxSeen bounds state per key, the timeout
    * bounds it across an unbounded key domain (both are needed on a real
    * stream; `<= 0` disables expiry for bounded/test domains). */
  def dedupedEvents(events: Dataset[KeyedEvent], maxSeen: Int = 10000,
                    timeoutMs: Long = 0L): Dataset[KeyedEvent] = {
    implicit val e1: Encoder[KeyedEvent] = Encoders.product[KeyedEvent]
    implicit val e2: Encoder[Long] = Encoders.scalaLong
    implicit val st: Encoder[Seq[Long]] = Encoders.kryo[Seq[Long]]
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Seq[Long], KeyedEvent](
        OutputMode.Append(), timeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[Seq[Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Seq.empty)
            val seenSet = scala.collection.mutable.LinkedHashSet(seen: _*)
            val out = scala.collection.mutable.ArrayBuffer.empty[KeyedEvent]
            rows.foreach { r =>
              if (seenSet.add(r.eventId)) out += r
            }
            val trimmed = seenSet.toSeq.takeRight(maxSeen)
            state.update(trimmed)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            out.iterator
          }
      }
  }

  /** Per-key running counts, emitting the updated total per batch.
    * `timeoutMs > 0` arms processing-time state expiry (unbounded streams
    * need it to bound the store); `<= 0` keeps state forever (bounded
    * key domains / tests). */
  def runningCounts(events: Dataset[KeyedEvent], timeoutMs: Long = 3600000L)
      : Dataset[CountUpdate] = {
    implicit val e1: Encoder[CountUpdate] = Encoders.product[CountUpdate]
    implicit val st: Encoder[Long] = Encoders.scalaLong
    val timeout =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Long, CountUpdate](
        OutputMode.Append(), timeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            Iterator.single(CountUpdate(key, total))
          }
      }
  }
}

/** Watermark-bounded streaming dedup — the built-in recipe that replaces
  * [[Stateful.dedupedEvents]] when events carry EVENT TIME: state for a
  * key is dropped once the watermark passes it, so the store is bounded by
  * the lateness budget (not by maxSeen/processing-time heuristics), and
  * duplicates arriving within the budget are dropped even across
  * micro-batches. The streaming counterpart of the batch exact-dedup.
  */
object WatermarkDedup {
  import org.apache.spark.sql.DataFrame

  /** `dropDuplicatesWithinWatermark` over `keys`, with the event-time
    * watermark `delay` (e.g. "10 minutes") on `eventTimeCol`. Emits each
    * key's FIRST arrival; duplicates within the watermark window are
    * dropped; a duplicate arriving after the state expired would re-emit —
    * the documented at-least-once trade every watermark dedup makes. */
  def dedup(events: DataFrame, keys: Seq[String], eventTimeCol: String,
            delay: String): DataFrame =
    events.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)
}
