package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is batch-only — its nearest analog is the FIFO job queue
  * and 2 s heartbeat liveness (SURVEY.md §2.4 streaming row); this is the
  * extension surface. Everything here takes a DataFrame so the SAME plan
  * fragment runs on `spark.readStream` input (incremental, stateful) and on
  * batch input (the correctness oracle `q_sessionize` / `q_events_hourly`
  * run the identical semantics declaratively).
  */
object Streams {

  /** Event-time tumbling-window counts with a 1-hour watermark: the
    * streaming twin of q_events_hourly. Late rows beyond the watermark are
    * dropped; state is bounded by (watermark horizon × event_type
    * cardinality). */
  def hourlyCounts(events: DataFrame): DataFrame = events
    .withWatermark("ts", "1 hour")
    .groupBy(window(col("ts"), "1 hour"), col("event_type"))
    .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    .select(unix_timestamp(col("window.start")).as("hour_ts"),
      col("event_type"), col("n"), col("sum_value"))

  /** Stream-static enrichment: join a stream against a batch dimension.
    * The static side broadcasts (re-read per micro-batch for parquet
    * sources, so slowly-changing dims stay fresh); the stream never
    * shuffles for the join. */
  def enrich(events: DataFrame, customers: DataFrame): DataFrame = events
    .join(broadcast(customers),
      events("user_id") === customers("c_custkey"), "left")
    .select(events("event_id"), events("user_id"), events("event_type"),
      events("value"), customers("c_mktsegment").as("segment"))

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, n_events: Long, start_us: Long,
      end_us: Long)

  /** 30-minute session gap, in microseconds. */
  val GapUs: Long = 1800L * 1000000

  /** Stateful sessionization with flatMapGroupsWithState: one state object
    * (the open session) per user; a gap > 30 min closes and emits the
    * previous session. Batch-equivalent: q_sessionize (operators.Complex).
    *
    * Within a micro-batch the group iterator is not time-ordered, so events
    * sort by (ts_us, event_id) first — correct as long as a single user's
    * events do not straddle micro-batches out of order (enforce upstream
    * with a watermark + dropLate policy in production).
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = Seq.newBuilder[Session]
          var open = state.getOption
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_us - s.endUs <= GapUs =>
                open = Some(SessionState(s.startUs, e.ts_us, s.n + 1))
              case Some(s) =>
                closed += Session(userId, s.n, s.startUs, s.endUs)
                open = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                open = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
