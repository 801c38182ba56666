package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators — the rest of the §2.10 surface beyond
  * incremental dedup: event-time windowed aggregation under a watermark,
  * and gap-based sessionization as explicit keyed state
  * (`flatMapGroupsWithState` with event-time timeout). Both are TRANSFORMS:
  * the identical code path runs over a static frame (watermark and timeouts
  * are no-ops in batch) and over `readStream` micro-batches — StreamingSpec
  * proves mode parity on the same input, the q23/q24 driver queries pin the
  * batch semantics against DuckDB.
  *
  * Scale shape: both are single keyed shuffles with bounded per-key state —
  * the windowed agg's state is one row per (open window, type), the
  * sessionizer's is the per-user list of sessions still inside the watermark
  * horizon (bounded by horizon/gap), evicted by the event-time timeout as
  * the watermark passes; nothing grows with history.
  */
object EventStreams {

  /** Sliding event-time window counts per event type (the streaming form of
    * q24's tumbling batch aggregation). Late events beyond `watermarkDelay`
    * are dropped in streaming mode; in batch the watermark is a no-op and
    * every event counts.
    */
  def windowedTypeCounts(
      events: DataFrame, // (user_id, ts, event_type, ...)
      watermarkDelay: String = "30 minutes",
      windowDur: String = "1 hour",
      slideDur: String = "30 minutes"
  ): DataFrame =
    events
      // an event without an event time belongs to no window; streaming's
      // watermark op would drop it anyway — filtering keeps batch/stream
      // parity exact instead of batch emitting a null-window group
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"),
        col("n"))

  final case class Session(
      user_id: String,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  private[graft] final case class SessState(start: Long, last: Long, n: Long)

  /** Pending per-user sessions, parallel-array packed for the state encoder.
    * Invariant: sorted by start, pairwise separated by >= gap (so `lasts` is
    * sorted too and a watermark test on the head finalizes a prefix).
    */
  private[graft] final case class SessBuf(
      starts: Array[Long], lasts: Array[Long], ns: Array[Long])

  /** Fold one timestamp into the sorted pending-session set: attach to the
    * session before/after it when within `gapMs`, merging the two neighbors
    * when the event bridges them — the move an eager open-session fold gets
    * wrong for cross-batch out-of-order events.
    */
  private[graft] def insertEvent(
      buf: scala.collection.mutable.ArrayBuffer[SessState], t: Long, gapMs: Long): Unit = {
    var idx = 0
    while (idx < buf.length && buf(idx).start <= t) idx += 1
    val prev = if (idx > 0) buf(idx - 1) else null
    val next = if (idx < buf.length) buf(idx) else null
    val joinPrev = prev != null && t - prev.last < gapMs // t inside prev's span also lands here
    val joinNext = next != null && next.start - t < gapMs
    if (joinPrev && joinNext) { // t bridges two previously-separate sessions
      buf(idx - 1) = SessState(prev.start, math.max(prev.last, next.last), prev.n + next.n + 1)
      buf.remove(idx)
    } else if (joinPrev) {
      buf(idx - 1) = SessState(prev.start, math.max(prev.last, t), prev.n + 1)
    } else if (joinNext) {
      buf(idx) = SessState(t, next.last, next.n + 1)
    } else {
      buf.insert(idx, SessState(t, t, 1))
    }
  }

  /** Gap sessionization with the q23 batch semantics (a gap >= `gapSec`
    * starts a new session). Streaming keeps ALL not-yet-final sessions as
    * keyed state and emits a session only once the watermark passes
    * `last + gap` — the only point where no admissible future event (every
    * one of which has ts >= watermark) can extend it, land inside it, or
    * bridge it to a neighbor. Eagerly emitting on a gap-proving later event
    * (the previous design) is wrong under cross-batch disorder: an event
    * older than the open session's start was silently merged with the start
    * kept wrong, and an in-gap straggler arriving after the close could
    * invalidate an already-emitted row. Buffering until the watermark makes
    * order irrelevant by construction; the event-time TIMEOUT parked at the
    * head session's `last + gap` flushes idle users without another event
    * from them. Per-key state is bounded by the watermark horizon / gap —
    * nothing grows with history.
    * In batch execution all of a user's events arrive in one invocation and
    * the watermark never advances: every session except the trailing open
    * one is event-closed and emitted — exactly what a finite stream emits
    * before its final watermark, which the parity StreamingSpec exploits.
    */
  def sessionize(
      events: DataFrame, // (user_id, ts, ...)
      gapSec: Long = 1800,
      watermarkDelay: String = "30 minutes"
  ): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000
    // batch execution eliminates the watermark node, and GroupState throws on
    // watermark/timeout calls there — capture the mode outside the closure
    val streaming = events.isStreaming
    events
      // project/cast BEFORE the watermark: a cast re-aliases the column and
      // silently drops the event-time watermark metadata the stateful
      // operator's analysis check looks for
      .select(col("user_id").cast("string").as("user_id"), col("ts").cast("timestamp").as("ts"))
      // an event without an event time cannot be placed in any session
      // (same rule as ConvAssembly): drop it, don't NPE on getTime in the
      // state fold — batch mode has no watermark op to drop it for us
      .where(col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessBuf, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: String, it: Iterator[(String, Timestamp)], state: GroupState[SessBuf]) =>
          val buf = scala.collection.mutable.ArrayBuffer[SessState]()
          state.getOption.foreach { b =>
            var i = 0
            while (i < b.starts.length) { buf += SessState(b.starts(i), b.lasts(i), b.ns(i)); i += 1 }
          }
          if (!state.hasTimedOut) {
            val ts = it.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            ts.foreach(t => insertEvent(buf, t, gapMs))
          }
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          def emitHead(): Unit = {
            val s = buf.remove(0)
            out += Session(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
          }
          if (streaming) {
            val wm = state.getCurrentWatermarkMs()
            while (buf.nonEmpty && buf.head.last + gapMs <= wm) emitHead()
            if (buf.isEmpty) { if (state.exists) state.remove() }
            else {
              state.update(SessBuf(
                buf.map(_.start).toArray, buf.map(_.last).toArray, buf.map(_.n).toArray))
              // strictly > wm: the flush loop above drained everything <= wm
              state.setTimeoutTimestamp(buf.head.last + gapMs)
            }
          } else {
            // batch: emit every event-closed session, hold the trailing one
            while (buf.length > 1) emitHead()
          }
          out.iterator
      }
  }
}
