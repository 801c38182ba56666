package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.synth.Turn

/** Watermark-gated conversation completeness for streaming ingest.
  *
  * `IncrementalDedup.processBatch` signs each conversation ONCE, from the
  * turns present in its micro-batch — correct only under the "every file
  * carries whole conversations" contract. A real ingest violates it: a long
  * conversation's turns land in several files/offsets, and signing a prefix
  * would poison the signature store (stores are append-once per conv).
  *
  * This stage buffers turns per conv_id in keyed state and releases a
  * conversation's turns ONLY when the event-time watermark passes
  * `last_turn_ts + idleGap` — the earliest point where no admissible event
  * can still extend it (the same buffer-until-watermark principle as
  * `EventStreams.sessionize`). Emission is therefore exactly-once per
  * conversation; downstream sees complete conversations regardless of how
  * the ingest chopped them into files.
  *
  * After emission the key holds a TOMBSTONE for `tombstoneTtlSec` of event
  * time: a straggler inside the watermark horizon that arrives after its
  * conversation closed is counted (`droppedLateTurns`) and dropped rather
  * than re-emitting a duplicate partial conversation into the append-once
  * stores. A turn arriving even later than that re-opens the key as a fresh
  * conversation — the same bounded-horizon contract as Spark's own
  * watermark: choose idleGap/watermarkDelay for the ingest's real tail.
  * State per key is bounded (buffered turns of ONE open conversation, or an
  * empty tombstone), and tombstones self-expire — nothing grows with
  * history.
  *
  * In batch execution every turn is present in the single invocation and
  * the watermark never advances: all conversations are complete by
  * definition and emitted immediately (exact batch parity, no tombstones).
  */
object ConvAssembly {

  /** Buffered turns as parallel arrays (state-encoder friendly); `emitted`
    * marks the tombstone phase where the arrays stay empty.
    */
  private[graft] final case class ConvBuf(
      emitted: Boolean,
      idxs: Array[Int],
      roles: Array[String],
      texts: Array[String],
      tools: Array[String],
      tss: Array[Long])

  def completeConversations(
      turns: DataFrame, // transcript schema (conv_id, turn_idx, role, text, tool, ts)
      idleGapSec: Long = 1800,
      watermarkDelay: String = "1 hour",
      tombstoneTtlSec: Long = 3600,
      droppedLateTurns: Option[org.apache.spark.util.LongAccumulator] = None
  ): Dataset[Turn] = {
    val spark = turns.sparkSession
    import spark.implicits._
    val gapMs = idleGapSec * 1000
    val ttlMs = tombstoneTtlSec * 1000
    val streaming = turns.isStreaming

    turns
      // a null ts cannot be placed against the watermark and a null conv_id
      // cannot cluster: drop both up front (the batch pipeline's assemble
      // applies the same conv_id rule) — one malformed row must not become
      // a poison pill the checkpoint replays forever
      .where(org.apache.spark.sql.functions.col("ts").isNotNull &&
        org.apache.spark.sql.functions.col("conv_id").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[Turn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvBuf, Turn](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (conv: String, it: Iterator[Turn], state: GroupState[ConvBuf]) =>
          val st = state.getOption.getOrElse(
            ConvBuf(emitted = false, Array.empty, Array.empty, Array.empty, Array.empty, Array.empty))

          def emit(b: ConvBuf): Iterator[Turn] =
            b.idxs.indices.iterator.map { i =>
              Turn(conv, b.idxs(i), b.roles(i), b.texts(i), b.tools(i),
                new java.sql.Timestamp(b.tss(i)))
            }

          if (state.hasTimedOut) {
            if (st.emitted) { state.remove(); Iterator.empty } // tombstone expired
            else {
              // conversation proved complete: release it, leave a tombstone
              val out = emit(st)
              state.update(ConvBuf(emitted = true, Array.empty, Array.empty,
                Array.empty, Array.empty, Array.empty))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
              out
            }
          } else {
            val incoming = it.toArray
            if (st.emitted) {
              // straggler after close: drop + count, never re-emit a partial
              droppedLateTurns.foreach(_.add(incoming.length))
              Iterator.empty
            } else {
              val buf = ConvBuf(
                emitted = false,
                st.idxs ++ incoming.map(_.turn_idx),
                st.roles ++ incoming.map(_.role),
                st.texts ++ incoming.map(_.text),
                st.tools ++ incoming.map(_.tool),
                st.tss ++ incoming.map(_.ts.getTime))
              if (!streaming) emit(buf) // batch: complete by definition
              else {
                val deadline = buf.tss.max + gapMs
                if (state.getCurrentWatermarkMs() >= deadline) {
                  // watermark already proves completeness: release now
                  val out = emit(buf)
                  state.update(ConvBuf(emitted = true, Array.empty, Array.empty,
                    Array.empty, Array.empty, Array.empty))
                  state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttlMs)
                  out
                } else {
                  state.update(buf)
                  state.setTimeoutTimestamp(deadline)
                  Iterator.empty
                }
              }
            }
          }
      }
  }
}
