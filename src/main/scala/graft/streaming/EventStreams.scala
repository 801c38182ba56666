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
  * sessionizer's is one 3-field struct per user, evicted by the event-time
  * timeout as the watermark passes; nothing grows with history.
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

  private[streaming] final case class SessState(start: Long, last: Long, n: Long)

  /** Gap sessionization with the q23 batch semantics (a gap >= `gapSec`
    * starts a new session): per-user open-session state, closed sessions
    * emitted as soon as a later event proves the gap, trailing sessions
    * emitted by the event-time TIMEOUT once the watermark passes
    * `last + gap` (so an idle user's session closes without another event
    * from them — the thing the pure-window q23 form cannot express).
    * In batch execution timeouts never fire: only event-closed sessions are
    * emitted, which is exactly what a finite stream emits before its final
    * watermark — the parity StreamingSpec exploits.
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
      .withWatermark("ts", watermarkDelay)
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: String, it: Iterator[(String, Timestamp)], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(st.start), new Timestamp(st.last), st.n))
          } else {
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            // micro-batch delivery order is arbitrary: sort the batch's
            // events before folding them into the open session
            val ts = it.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            var st = state.getOption.orNull
            ts.foreach { t =>
              if (st == null) st = SessState(t, t, 1)
              else if (t - st.last >= gapMs) {
                out += Session(user, new Timestamp(st.start), new Timestamp(st.last), st.n)
                st = SessState(t, t, 1)
              } else st = SessState(st.start, math.max(st.last, t), st.n + 1)
            }
            if (st != null && streaming) {
              val wm = state.getCurrentWatermarkMs()
              if (wm > st.last + gapMs) {
                // the watermark already proves no event can extend this
                // session: close it now instead of parking a timeout
                out += Session(user, new Timestamp(st.start), new Timestamp(st.last), st.n)
                state.remove()
              } else {
                state.update(st)
                state.setTimeoutTimestamp(st.last + gapMs)
              }
            }
            // batch: the trailing open session is never emitted — exactly a
            // finite stream's behavior before its final watermark
            out.iterator
          }
      }
  }
}
