package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the streaming form of the
  * batch gaps-and-islands operator (DeclaredExt.q20), expressed with
  * `KeyValueGroupedDataset.flatMapGroupsWithState`: per-user session
  * state lives in the state store, a session closes when the event-time
  * gap exceeds `gapMs`, and an idle session is flushed by an event-time
  * TIMEOUT once the watermark passes its close point (no event needed).
  *
  * Scale: state is per-key (one small SessState per active user),
  * partitioned by the groupBy key across executors, checkpointed with
  * the query — the Structured-Streaming shape for arbitrary stateful
  * logic the built-in windowed aggregates can't express.
  *
  * Semantics note (documented trade, standard for this pattern): events
  * are processed in event-time order WITHIN a micro-batch; an event that
  * arrives in a later batch but before the watermark may start a new
  * session rather than extend a closed one retroactively. The batch q20
  * formulation is the exact-ground-truth the test compares against on
  * in-order input.
  */
object StreamingSessionize {

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessState(startMs: Long, lastMs: Long, n: Long, sv: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n: Long, sv: Double)

  val DefaultGapMs: Long = 1800L * 1000 // 30 min, matching q20

  def sessions(events: Dataset[SessEvent], gapMs: Long = DefaultGapMs,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def close(user: Long, s: SessState): Session =
      Session(user, s.startMs, s.lastMs, s.n, s.sv)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[SessEvent], state: GroupState[SessState]) =>
          val out = scala.collection.mutable.ListBuffer.empty[Session]
          if (batch.isEmpty && state.hasTimedOut) {
            // Watermark passed the open session's close point: flush it.
            state.getOption.foreach(s => out += close(user, s))
            state.remove()
          } else {
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(SessState(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.sv + e.value))
                case Some(s) =>
                  out += close(user, s)
                  cur = Some(SessState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Clamp: a batch of only late (pre-watermark) events would
              // otherwise compute a timeout at-or-before the watermark,
              // which setTimeoutTimestamp rejects and the query dies.
              // The clamped session flushes at the next trigger instead.
              state.setTimeoutTimestamp(
                math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
      }
  }
}
