package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY.md §7.5): the
  * `flatMapGroupsWithState` twin of the batch `q_sessionize` query.
  * Sessions close when a subsequent event arrives more than `gapUs` after
  * the previous one; closed sessions are emitted append-style, the open
  * session stays in group state. MemoryStream-tested (StreamingSpec) — no
  * SQL oracle can model group state, which is why the oracle-matched
  * variant is the batch lag/running-sum form in StreamOps.
  */
object Sessionize {

  val gapUs: Long = 30L * 60 * 1000 * 1000

  final case class Event(userId: Long, tsUs: Long, eventType: String)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class Session(userId: Long, sessionStart: Long,
                           sessionEnd: Long, nEvents: Long)

  private def step(userId: Long, events: Iterator[Event],
                   state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.tsUs))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.tsUs - s.end <= gapUs =>
          open = Some(OpenSession(s.start, e.tsUs max s.end, s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start, s.end, s.n)
          open = Some(OpenSession(e.tsUs, e.tsUs, 1))
        case None =>
          open = Some(OpenSession(e.tsUs, e.tsUs, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Append-mode sessionization over a (possibly streaming) Dataset.
    * NoTimeout variant: an idle user's open session stays in state until
    * a later event from the same user closes it. */
  def apply(events: Dataset[Event]): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val oe = Encoders.product[OpenSession]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }

  final case class TimedEvent(userId: Long, tsUs: Long, eventType: String,
                              eventTime: java.sql.Timestamp)

  private def stepTimeout(userId: Long, events: Iterator[TimedEvent],
                          state: GroupState[OpenSession])
      : Iterator[Session] = {
    if (state.hasTimedOut) {
      // Watermark passed session end + gap with no new events: the session
      // can never be extended — close and clear. This is what bounds state
      // size on an unbounded stream (the NoTimeout variant retains one
      // open session per ever-seen user forever).
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.start, s.end, s.n))
    } else {
      val out = step(userId,
        events.map(e => Event(e.userId, e.tsUs, e.eventType)), state)
      state.getOption.foreach { open =>
        // ceil to ms: truncating µs→ms would arm the timeout up to ~1ms
        // before end+gap, letting a boundary event that `step` would
        // still merge find its session already closed.
        state.setTimeoutTimestamp((open.end + gapUs + 999) / 1000)
      }
      out
    }
  }

  /** Watermarked sessionization with event-time state timeout: sessions
    * close either when a same-user event arrives past the gap, or when the
    * event-time watermark (here: `delay` behind max event time) passes the
    * open session's end + gap — so idle users' sessions both get emitted
    * AND their state is reclaimed. This is the production shape for an
    * unbounded stream; `apply` above is the state-unbounded teaching
    * variant. */
  def withTimeout(events: Dataset[Event],
                  delay: String = "10 minutes"): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val oe = Encoders.product[OpenSession]
    implicit val te = Encoders.product[TimedEvent]
    implicit val le = Encoders.scalaLong
    events
      .withColumn("eventTime", timestamp_micros(col("tsUs")))
      .as[TimedEvent]
      .withWatermark("eventTime", delay)
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(stepTimeout)
  }
}
