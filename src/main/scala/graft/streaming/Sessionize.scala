package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
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

  /** Append-mode sessionization over a (possibly streaming) Dataset. */
  def apply(events: Dataset[Event]): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val oe = Encoders.product[OpenSession]
    implicit val le = Encoders.scalaLong
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(step)
  }
}
