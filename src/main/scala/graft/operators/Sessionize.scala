package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class SessionEvent(user_id: Long, t: Long)
final case class Session(user_id: Long, sid: Long, start_ms: Long, end_ms: Long, n: Long)
final case class SessionState(sid: Long, start: Long, end: Long, n: Long)

/** Gap-based sessionization — the canonical custom-state stream operator.
  *
  * Two equivalent paths:
  *  - [[batch]]: pure window functions (lag → new-session flag → running sum
  *    = session id → aggregate). One shuffle on user_id; everything stays in
  *    Catalyst, so this is the 100 TB path for offline sessionization.
  *  - [[streamingClosed]]: `flatMapGroupsWithState` keeping one open session
  *    per user in [[GroupState]] and emitting sessions as the event-time gap
  *    closes them — the online path; the open tail session stays in state.
  */
object Sessionize {

  /** Sessions per user: a new session starts when the gap to the previous
    * event exceeds `gapMs`. */
  def batch(events: DataFrame, userCol: String, tsCol: String, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new", when(col("_prev").isNull ||
        col(tsCol) - col("_prev") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("_new")).over(run))
      .groupBy(col(userCol).as("user_id"), col("sid"))
      .agg(min(col(tsCol)).as("start_ms"), max(col(tsCol)).as("end_ms"),
        count(lit(1)).as("n"))
  }

  /** Streaming sessionization over a grouped event stream: emits every
    * session the incoming data CLOSES (a later event for the user exceeded
    * the gap); the newest session per user stays open in state. Events are
    * sorted per group before folding, so results are order-deterministic
    * within a micro-batch.
    *
    * Memory note: `it.toSeq.sortBy` buffers ONE user's events of ONE
    * micro-batch on the executor — bounded by the trigger's admission
    * control (`maxOffsetsPerTrigger`/`maxBytesPerTrigger`), not by total
    * stream size. A single user dominating an unbounded trigger is the
    * failure mode; cap the trigger when user skew is possible. */
  def streamingClosed(events: Dataset[SessionEvent], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    def fold(user: Long, it: Iterator[SessionEvent],
             state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(_.t)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.t - s.end <= gapMs =>
            cur = Some(s.copy(end = math.max(s.end, e.t), n = s.n + 1))
          case Some(s) =>
            closed += Session(user, s.sid, s.start, s.end, s.n)
            cur = Some(SessionState(s.sid + 1, e.t, e.t, 1))
          case None =>
            cur = Some(SessionState(1L, e.t, e.t, 1))
        }
      }
      cur.foreach(state.update)
      closed.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
