package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful processing on the `transformWithState` API (the
  * Spark 4.x successor of `flatMapGroupsWithState`, backed by the
  * RocksDB state store with fine-grained typed state): per-user
  * running totals maintained in a `ValueState`.
  *
  * Determinism under ANY batching: long additions are commutative, so
  * the ACCUMULATED state after the last batch is batching-independent
  * even though which rows arrive per micro-batch is not. Each
  * `handleInputRows` call emits the state with a per-key `seq` that
  * increments once per batch; the batch-side consumer keeps the
  * max-`seq` row per key — the final totals — so the parity oracle
  * holds whether the file source delivered one batch or fifty.
  *
  * Money-exact accumulation: values are fixed to 4 decimal places
  * (HALF_UP, the DECIMAL(18,4) contract every other money aggregate
  * in this engine uses) and summed as scaled longs — order-insensitive
  * and overflow-checked, unlike a running double sum.
  *
  * Scale: state is one small row per key, partitioned by the grouping
  * key across the state store's shuffle partitions; no driver state,
  * no unbounded growth (TTL is available via TTLConfig for keys that
  * must expire — unused here because the parity query is bounded).
  */
object StateV2 {

  case class Totals(seq: Long, n: Long, cents: Long)
  case class TotalsOut(user_id: Long, seq: Long, n_events: Long,
      total_value: Double)

  class RunningTotals extends StatefulProcessor[Long, (Long, Double), TotalsOut] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[TotalsOut] = {
      val prev = Option(state.get()).getOrElse(Totals(0L, 0L, 0L))
      var n = prev.n
      var cents = prev.cents
      rows.foreach { case (_, v) =>
        n += 1
        cents = math.addExact(cents,
          BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .underlying.unscaledValue.longValueExact)
      }
      val cur = Totals(prev.seq + 1, n, cents)
      state.update(cur)
      Iterator.single(TotalsOut(key, cur.seq, n, cents / 10000.0))
    }
  }

  /** (user_id, value) stream → per-batch cumulative totals per user;
    * keep the max-`seq` row per user for the final state. */
  def runningTotals(events: Dataset[(Long, Double)]): Dataset[TotalsOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotals, TimeMode.None(),
        OutputMode.Append())
  }

  /** Gap sessionizer on the transformWithState API, exercising
    * EVENT-TIME TIMERS (the corner `flatMapGroupsWithState` covers
    * with GroupStateTimeout): sessions close in-stream when a gap
    * appears inside a batch, or by a per-key timer when the watermark
    * passes last-event + gap. Exactly one live timer per key (stale
    * timers are deleted before re-registering), so timer state is
    * O(active keys) like the value state itself. Output contract is
    * identical to [[Sessionize.sessions]] — the parity spec feeds
    * both the same batches and compares closed sessions. */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Timestamp, Double),
        Sessionize.SessionOut] {
    @transient private var st: ValueState[Sessionize.SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Sessionize.SessionState]("sess",
        Encoders.product[Sessionize.SessionState], TTLConfig.NONE)

    private def close(key: Long, s: Sessionize.SessionState) =
      Sessionize.SessionOut(key, s.start, s.last, s.n, s.total)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Timestamp, Double)],
        timerValues: TimerValues): Iterator[Sessionize.SessionOut] = {
      // sort by (timestamp, value) exactly like Sessionize.sessions —
      // with 3+ tied-timestamp events a timestamp-only sort could fold
      // total_value in a different order and drift by an ULP, breaking
      // the bit-exact parity contract the spec asserts
      val sorted = rows.toArray.sortBy(r => (r._2.getTime, r._3))
      var out = List.empty[Sessionize.SessionOut]
      var cur = Option(st.get())
      sorted.foreach { case (_, ts, v) =>
        val tUs = ts.getTime * 1000L
        cur = cur match {
          case Some(s) if tUs - s.last > gapMs * 1000L =>
            out ::= close(key, s)
            Some(Sessionize.SessionState(tUs, tUs, 1L, v))
          case Some(s) =>
            Some(Sessionize.SessionState(s.start, math.max(s.last, tUs),
              s.n + 1, s.total + v))
          case None =>
            Some(Sessionize.SessionState(tUs, tUs, 1L, v))
        }
      }
      cur.foreach { s =>
        st.update(s)
        getHandle.listTimers()
          .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.last / 1000L + gapMs)
      }
      out.reverse.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Sessionize.SessionOut] =
      Option(st.get()) match {
        // the timer may be stale if events arrived after it was set
        // and the rewrite raced; only close a genuinely idle session
        case Some(s)
            if expiredTimerInfo.getExpiryTimeInMs >= s.last / 1000L + gapMs =>
          st.clear()
          Iterator.single(close(key, s))
        case _ => Iterator.empty
      }
  }

  /** (user_id, t, value) watermarked stream → closed sessions. */
  def sessions(events: Dataset[(Long, Timestamp, Double)],
      gap: java.time.Duration): Dataset[Sessionize.SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new SessionProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
