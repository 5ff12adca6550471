package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream analytics (SURVEY §2.9 + the prompt's streaming toolkit):
  * watermarked windowed aggregation and custom-state sessionization over a
  * live event stream — the streaming twins of the batch operators q10
  * (daily activity) and q24 (sessionize), built so their FINAL outputs
  * match the batch results on the same data (asserted in StreamingSpec).
  *
  * Input contract (both functions): an (unbounded) DataFrame with
  *   user_id long, event_id long, ts timestamp, value double.
  */
object EventStream {

  /** Watermarked tumbling-window activity counts: events and value totals
    * per (window, user). Late events beyond `watermark` are dropped; with
    * update/append mode the state for closed windows is evicted — bounded
    * memory on an unbounded stream.
    */
  def windowedActivity(
      events: DataFrame,
      window: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("user_id"),
        col("n_events"), col("total_value"))

  // --------------------------------------------------------------- sessions

  case class Event(user_id: Long, event_id: Long, us: Long, value: Double)
  case class SessionState(
      sessionId: Long, startUs: Long, lastUs: Long, n: Long, total: Double)
  case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, total_value: Double)

  /** Custom-state sessionization via flatMapGroupsWithState: a session
    * CLOSES (and is emitted) when a later event arrives more than `gapUs`
    * after it — identical to the oracle-verified batch q24 semantics; the
    * spec replays the events table through this operator and asserts
    * set-equality with the batch result. State per user is ONE small
    * struct — memory is O(active users), not O(events).
    *
    * Events inside a micro-batch arrive unordered: each batch's group
    * iterator is sorted before folding, and batches are assumed
    * time-ordered per user (true for replayable sources with event-time
    * partitioned input; cross-batch disorder is bounded by the source's
    * watermark). Open sessions flush when the next event (or a
    * far-future sentinel — see [[drainSentinels]]) proves the gap; a
    * deployment wanting wall-clock flushes adds a GroupStateTimeout on
    * top of the same fold.
    */
  def sessionize(
      events: Dataset[Event],
      gapUs: Long = 1800L * 1000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.us, e.event_id))
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.us - s.lastUs <= gapUs =>
                // a cross-batch LATE event (e.us < lastUs, inside the
                // source's disorder bound) merges without dragging the
                // session edges backwards: lastUs must stay monotone or
                // the NEXT on-time event sees an inflated gap and falsely
                // splits the session (r10 review finding)
                cur = Some(s.copy(
                  startUs = math.min(s.startUs, e.us),
                  lastUs = math.max(s.lastUs, e.us),
                  n = s.n + 1, total = s.total + e.value))
              case Some(s) =>
                closed ::= SessionOut(userId, s.sessionId, s.n, s.startUs, s.lastUs, s.total)
                cur = Some(SessionState(s.sessionId + 1, e.us, e.us, 1, e.value))
              case None =>
                cur = Some(SessionState(1L, e.us, e.us, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  /** Force-close all open sessions of a final micro-batch run: feed one
    * sentinel far-future event per user, then drop sentinel sessions.
    * Test/drain helper for bounded replays of the unbounded operator.
    */
  def drainSentinels(users: Seq[Long], afterUs: Long): Seq[Event] =
    users.map(u => Event(u, Long.MaxValue, afterUs, 0.0))
}
