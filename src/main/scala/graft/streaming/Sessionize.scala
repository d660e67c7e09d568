package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as a custom stateful streaming operator
  * (`flatMapGroupsWithState` + event-time timeout) — the
  * Structured-Streaming-native replacement for the reference's
  * hand-rolled per-key offset state machine
  * (DatastreamEventReader.java:302-370): state lives in the store
  * (checkpointed, partitioned by key), sessions close either by an
  * in-stream gap or by watermark timeout, and output is append-only.
  *
  * Scale: state is per active user (bounded by timeout eviction, not
  * by history), shuffled once on user_id; no driver-side state.
  */
object Sessionize {

  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  /** @param events streaming DataFrame with (user_id long, t timestamp,
    *               value double); must already carry a watermark on `t`.
    * @param gap    inactivity gap closing a session */
  def sessions(events: DataFrame, gap: java.time.Duration): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gap.toNanos / 1000
    // `t` must pass through untouched: casting it would create a fresh
    // attribute without the watermark tag and break event-time timeout
    events.select(col("user_id").cast("long"), col("t"),
        col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, ts, value) =>
              val us = ts.getTime * 1000
              cur match {
                case Some(s) if us - s.last > gapUs =>
                  closed ::= SessionOut(uid, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(us, us, 1, value))
                case Some(s) =>
                  cur = Some(s.copy(last = math.max(s.last, us),
                    n = s.n + 1, total = s.total + value))
                case None =>
                  cur = Some(SessionState(us, us, 1, value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close via watermark once the gap has passed quietly
              state.setTimeoutTimestamp(s.last / 1000 + gapUs / 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
