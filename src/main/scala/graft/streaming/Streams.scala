package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, Trigger, ValueState}

import graft.Q
import graft.operators.Arith

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
    // dsum: exact decimal accumulation — identical across micro-batch
    // orders AND engines, so the streaming result is oracle-comparable
    .agg(count(lit(1)).as("n"), Arith.dsum(col("value")).as("sum_value"))
    .select(unix_timestamp(col("window.start")).as("hour_ts"),
      col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time windows (1 h length, 30 min slide) on a stream:
    * the streaming twin of q_events_sliding. Every event expands into
    * length/slide = 2 window rows BEFORE the stateful aggregation, so
    * partial aggregation still applies per micro-batch; the watermark
    * bounds state exactly as in [[hourlyCounts]] (horizon × event_type ×
    * 2 open windows). */
  def slidingCounts(events: DataFrame): DataFrame = events
    .withWatermark("ts", "1 hour")
    .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
    .agg(count(lit(1)).as("n"), Arith.dsum(col("value")).as("sum_value"))
    .select(unix_timestamp(col("window.start")).as("win_start"),
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

  /** Stream-stream inner join with watermarks: each click pairs with the
    * purchases the same user makes within the next 30 minutes. BOTH sides
    * carry a watermark and the join condition bounds the event-time range,
    * so each side's buffered state is reclaimable once the watermark
    * passes the range — the canonical bounded-state stream-stream join.
    * Works identically on batch inputs (the StreamingSpec twin).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    c.join(p, col("c_user") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"))
  }

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, n_events: Long, start_us: Long,
      end_us: Long)
  case class FEv(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  /** Per-user funnel clocks; −1 = stage not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelUser(user_id: Long, s1: Boolean, s2: Boolean,
      s3: Boolean)
  /** [[FunnelState]] plus the live-stream bookkeeping of the retained
    * arm: last activity instant (drives the TTL) and whether the clocks
    * changed since the last emission (drives delta emission). */
  case class FunnelStateR(t1: Long, t2: Long, t3: Long, lastUs: Long,
      dirty: Boolean)

  /** 30-minute session gap, in microseconds. */
  val GapUs: Long = 1800L * 1000000

  /** Stateful sessionization with flatMapGroupsWithState: one state object
    * (the open session) per user; a gap > 30 min closes and emits the
    * previous session. Batch-equivalent: q_sessionize (operators.Complex).
    *
    * State is BOUNDED: an event-time timeout fires once the watermark
    * passes (session end + gap), emitting the idle session and reclaiming
    * the user's state — without it, the last open session per user would
    * never emit and churned users would leak state forever.
    *
    * Within a micro-batch the group iterator is not time-ordered, so events
    * sort by (ts_us, event_id) first. ACROSS batches the watermark only
    * bounds lateness to the 30-minute horizon — it does not prevent a
    * within-horizon late event from arriving after the session has
    * advanced — so the merge extends the session with min(start)/max(end)
    * rather than overwriting the end (an overwrite would let a late event
    * REGRESS the session end and mis-split on the next gap test).
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    val sp = events.sparkSession
    import sp.implicits._
    val isStreaming = events.isStreaming // timeouts only exist on streams
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the session can no longer grow
            val out = state.getOption
              .map(s => Session(userId, s.n, s.startUs, s.endUs))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val closed = Seq.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_us - s.endUs <= GapUs =>
                  open = Some(SessionState(math.min(s.startUs, e.ts_us),
                    math.max(s.endUs, e.ts_us), s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.n, s.startUs, s.endUs)
                  open = Some(SessionState(e.ts_us, e.ts_us, 1))
                case None =>
                  open = Some(SessionState(e.ts_us, e.ts_us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // clamp: a backlog replay can put end+gap at/under the
              // watermark, which setTimeoutTimestamp rejects — the session
              // then times out on the very next no-data batch instead
              if (isStreaming)
                state.setTimeoutTimestamp(math.max(
                  s.endUs / 1000 + GapUs / 1000,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** [[sessionize]]'s exact semantics re-expressed on Spark 4's
    * transformWithState API — the arbitrary-state operator that replaces
    * flatMapGroupsWithState (SPARK-40434): explicit named ValueState
    * instead of the single implicit GroupState, explicit event-time
    * TIMERS instead of setTimeoutTimestamp (re-armed per batch: stale
    * timers deleted, the new one clamped past the current watermark —
    * the same clamp the fmgws arm needs), and a separate
    * handleExpiredTimer callback instead of the hasTimedOut branch.
    * Requires the RocksDB state-store provider (a transformWithState
    * constraint — callers set it; the registered row does).
    *
    * Kept semantically IDENTICAL to [[sessionize]] — same in-batch
    * (ts_us, event_id) sort, same min/max late-merge, same gap rule, same
    * timer arithmetic — and held to it twice over: StreamingSpec drives
    * both arms on one planted multi-batch feed, and the registered row
    * q_stream_sessionize_tws verifies against q_stream_sessionize's
    * DuckDB oracle VERBATIM, timeout boundary included. */
  private class SessionTws extends StatefulProcessor[Long, Ev, Session] {
    @transient private var open: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val closed = Seq.newBuilder[Session]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts_us - s.endUs <= GapUs =>
            cur = Some(SessionState(math.min(s.startUs, e.ts_us),
              math.max(s.endUs, e.ts_us), s.n + 1))
          case Some(s) =>
            closed += Session(userId, s.n, s.startUs, s.endUs)
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
          case None =>
            cur = Some(SessionState(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { s =>
        open.update(s)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        // +1: the two APIs disagree at the watermark BOUNDARY — fmgws
        // fires a timeout iff ts < watermark (strict), but tws expires
        // timers iff ts <= watermark (TimerStateImpl's expiry iterator
        // stops only when ts > watermark). Registering at fmgwsTs + 1
        // makes the tws firing rule (fmgwsTs + 1 <= wm) exactly the
        // fmgws rule (fmgwsTs < wm), so both arms satisfy the shared
        // oracle's strict-inequality timeout law at the boundary too.
        getHandle.registerTimer(math.max(s.endUs / 1000 + GapUs / 1000,
          tv.getCurrentWatermarkInMs() + 1) + 1)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      val out =
        if (open.exists()) {
          val s = open.get()
          Iterator.single(Session(userId, s.n, s.startUs, s.endUs))
        } else Iterator.empty
      open.clear()
      out
    }
  }

  /** The transformWithState sessionizer — see [[SessionTws]]. */
  def sessionizeTws(events: Dataset[Ev]): Dataset[Session] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTws, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Streaming ordered-funnel state machine: one [[FunnelState]] of three
    * stage clocks per user, advanced per event, SNAPSHOT-emitted when the
    * watermark overtakes the user (event-time timeout just above the
    * current watermark — the "emit the funnel as of the watermark"
    * pattern; on a live deployment every advancing watermark re-arms the
    * timeout, so each user re-emits at most once per idle period).
    * Batch-equivalent: q_funnel (operators.Complex) — stage k's earliest
    * qualifying instant is a MIN over events strictly later than stage
    * k−1's clock, and processing the group in (ts_us, event_id) order
    * makes the running first-match EXACTLY that MIN: when a click is
    * examined, every earlier-ts signup has already set t1, and no later
    * event can lower t1 below the click's ts. Cross-batch exactness
    * therefore needs event-time-ordered batches — the registered row
    * drains AvailableNow in ONE batch and enforces that loudly, the
    * q_stream_sessionize contract. State is three longs per user, bounded
    * by ACTIVE USERS and reclaimed at emission. */
  def funnelSnapshot(events: Dataset[FEv]): Dataset[FunnelUser] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[FEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              FunnelUser(userId, s.t1 >= 0, s.t2 >= 0, s.t3 >= 0))
            state.remove()
            out.iterator
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              s = advanceFunnel(s, e)
            }
            state.update(s)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** One event against the three stage clocks — strict ordering (each
    * stage's instant must be strictly later than the previous stage's),
    * first qualifying instant wins. Shared by [[funnelSnapshot]] and
    * [[funnelRetained]] so the two arms cannot drift apart. */
  private def advanceFunnel(s: FunnelState, e: FEv): FunnelState =
    e.event_type match {
      case "signup" if s.t1 < 0 => s.copy(t1 = e.ts_us)
      case "click" if s.t1 >= 0 && e.ts_us > s.t1 && s.t2 < 0 =>
        s.copy(t2 = e.ts_us)
      case "purchase" if s.t2 >= 0 && e.ts_us > s.t2 && s.t3 < 0 =>
        s.copy(t3 = e.ts_us)
      case _ => s
    }

  /** The LIVE-deployment arm of [[funnelSnapshot]] (the r11 self-review
    * follow-up): where the snapshot arm emits-and-REMOVES on each idle
    * flush — correct for a single-drain registered row, but a user who
    * returns after an idle period restarts a fresh funnel — this arm
    * RETAINS state across idle periods, so a signup→click user who
    * purchases a week later still completes the funnel. Live-stream
    * semantics that come with retention:
    *  - delta emission: an idle flush emits a user's snapshot only if
    *    the stage clocks CHANGED since the last emission (first flush
    *    always emits), so consecutive no-progress flushes are silent and
    *    a user emits at most once per idle period with progress.
    *    Downstream consumers therefore see an append-only snapshot
    *    HISTORY per user and must dedupe by keeping the latest row per
    *    user (in event-time order of arrival);
    *  - TTL reclaim: once the watermark passes last activity + `ttlUs`
    *    the user's state is dropped (with a final emission if dirty), so
    *    state is bounded by users ACTIVE WITHIN THE TTL window, not by
    *    all users ever seen — the retention/boundedness trade is an
    *    explicit config knob instead of the snapshot arm's
    *    reset-on-flush;
    *  - while retained, every timeout re-arms at watermark+1 — one
    *    state read per retained user per watermark advance is the
    *    bookkeeping cost of TTL expiry without a timer index.
    */
  def funnelRetained(events: Dataset[FEv], ttlUs: Long): Dataset[FunnelUser] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStateR, FunnelUser](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[FEv], state: GroupState[FunnelStateR]) =>
          if (state.hasTimedOut) {
            val s = state.get
            val out =
              if (s.dirty)
                Iterator.single(FunnelUser(userId, s.t1 >= 0, s.t2 >= 0,
                  s.t3 >= 0))
              else Iterator.empty
            val expired = state.getCurrentWatermarkMs() >=
              s.lastUs / 1000 + ttlUs / 1000
            if (expired) state.remove()
            else {
              state.update(s.copy(dirty = false))
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            }
            out
          } else {
            var s = state.getOption.getOrElse(
              FunnelStateR(-1L, -1L, -1L, Long.MinValue, dirty = true))
            it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              val adv = advanceFunnel(FunnelState(s.t1, s.t2, s.t3), e)
              s = FunnelStateR(adv.t1, adv.t2, adv.t3,
                math.max(s.lastUs, e.ts_us),
                s.dirty || (adv.t1, adv.t2, adv.t3) != (s.t1, s.t2, s.t3))
            }
            state.update(s)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** [[funnelRetained]] re-expressed on transformWithState, the same
    * dual-arm discipline as [[SessionTws]]/[[sessionizeTws]]: identical
    * fold ([[advanceFunnel]] in (ts_us, event_id) order), identical
    * delta-emission and TTL-reclaim rules, and the same +1 timer shift —
    * fmgws fires a timeout iff ts < watermark while tws expires timers
    * iff ts <= watermark, so every timer registers at fmgwsTs + 1 to land
    * on the same boundary. StreamingSpec drives both arms through one
    * planted 4-batch feed (idle flush → post-idle return → TTL reclaim)
    * and requires emission-for-emission equality.
    *
    * With [[SessionTws]] this covers both arbitrary-state APIs production
    * code meets on Spark 4 — session-style state (emit on close) and
    * machine-style state (delta snapshots with TTL) — each checked
    * against its flatMapGroupsWithState twin. */
  private class FunnelRetainedTws(ttlUs: Long)
      extends StatefulProcessor[Long, FEv, FunnelUser] {
    @transient private var st: ValueState[FunnelStateR] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelStateR]("funnel",
        Encoders.product[FunnelStateR], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[FEv],
        tv: TimerValues): Iterator[FunnelUser] = {
      var s = if (st.exists()) st.get()
        else FunnelStateR(-1L, -1L, -1L, Long.MinValue, dirty = true)
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val adv = advanceFunnel(FunnelState(s.t1, s.t2, s.t3), e)
        s = FunnelStateR(adv.t1, adv.t2, adv.t3,
          math.max(s.lastUs, e.ts_us),
          s.dirty || (adv.t1, adv.t2, adv.t3) != (s.t1, s.t2, s.t3))
      }
      st.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1 + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelUser] = {
      // a stray/duplicate timer delivered after st.clear() must be a
      // no-op, not an NPE task failure (SessionTws has the same guard)
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      val out =
        if (s.dirty)
          Iterator.single(FunnelUser(userId, s.t1 >= 0, s.t2 >= 0,
            s.t3 >= 0))
        else Iterator.empty
      val expired = tv.getCurrentWatermarkInMs() >=
        s.lastUs / 1000 + ttlUs / 1000
      if (expired) st.clear()
      else {
        st.update(s.copy(dirty = false))
        // the framework deletes the fired timer; re-arm for the next
        // watermark advance (the fmgws wm+1 rule, +1-shifted)
        getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1 + 1)
      }
      out
    }
  }

  /** [[funnelSnapshot]] re-expressed on transformWithState — the third
    * dual-arm stateful pair (after [[SessionTws]] and
    * [[FunnelRetainedTws]]): identical fold ([[advanceFunnel]] in
    * (ts_us, event_id) order) and the same emit-and-REMOVE timeout
    * semantics, with the +1 timer shift — fmgws fires a timeout iff
    * ts < watermark while tws expires timers iff ts <= watermark, so the
    * timer registers at fmgwsTs + 1 to land on the same boundary.
    * Unlike the retained arm there is no TTL bookkeeping: the snapshot
    * flush clears state, so an expired timer never re-arms. */
  private class FunnelSnapshotTws
      extends StatefulProcessor[Long, FEv, FunnelUser] {
    @transient private var st: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[FEv],
        tv: TimerValues): Iterator[FunnelUser] = {
      var s = if (st.exists()) st.get() else FunnelState(-1L, -1L, -1L)
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        s = advanceFunnel(s, e)
      }
      st.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(tv.getCurrentWatermarkInMs() + 1 + 1)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[FunnelUser] = {
      // a stray/duplicate timer after st.clear() is a no-op, not an NPE
      if (!st.exists()) return Iterator.empty
      val s = st.get()
      st.clear()
      Iterator.single(FunnelUser(userId, s.t1 >= 0, s.t2 >= 0, s.t3 >= 0))
    }
  }

  /** The transformWithState snapshot-funnel arm — see
    * [[FunnelSnapshotTws]]. */
  def funnelSnapshotTws(events: Dataset[FEv]): Dataset[FunnelUser] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[FEv]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelSnapshotTws, TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** The transformWithState retained-funnel arm — see [[FunnelRetainedTws]]. */
  def funnelRetainedTws(events: Dataset[FEv], ttlUs: Long): Dataset[FunnelUser] = {
    val sp = events.sparkSession
    import sp.implicits._
    events.toDF()
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[FEv]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelRetainedTws(ttlUs), TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Driver-checkable streaming row: a real file-source STREAM over the
    * events parquet, drained with Trigger.AvailableNow through
    * [[hourlyCounts]] into a named memory sink, returned as the sink
    * table. The memory/complete sink is the harness choice — its size is
    * the AGGREGATE output (hours × event types), not the input; a
    * production deployment sinks append-mode parquet/Kafka with watermark
    * eviction instead. The oracle is the same SQL as the batch twin
    * q_events_hourly (minus countDistinct, which streaming aggregation
    * doesn't support exactly — that is what approx_count_distinct is for).
    */
  /** The file-source stream over the events parquet — the shared recipe
    * for every registered streaming row. Subtleties, in one place:
    *  - glob, not the bare file path: for a non-glob path the file stream
    *    source force-sets basePath to the path itself, which then fails
    *    the "basePath must be a directory" check;
    *  - footer-only batch read supplies the schema;
    *  - maxFilesPerTrigger is pinned HIGH so AvailableNow drains the whole
    *    input as ONE micro-batch: split batches would advance the
    *    watermark between them and drop "late" rows that the batch-twin
    *    oracles keep — correctness here must not depend on file layout;
    *  - same ts normalization (nanos-as-long / NTZ / timestamp dispatch)
    *    as the batch Tables.events reader, via Tables.normalizeTs.
    */
  private def eventsStream(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$d/events.parquet").schema // footer only
    graft.Tables.normalizeTs(
      s.readStream.schema(schema)
        .option("basePath", d)
        .option("maxFilesPerTrigger", "1000000")
        .parquet(s"$d/events*.parquet"))
  }

  /** Per-JVM scratch root for streaming sink/checkpoint dirs, removed by a
    * shutdown hook: each q_stream_hourly_append invocation needs fresh
    * dirs (the bench runs every query twice), and without a bounded root
    * they would accumulate across rounds in /tmp. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-stream-scratch")
    graft.operators.Scratch.register(root.toString)
    root
  }

  val queries: Seq[Q] = Seq(
    Q("q_stream_hourly",
      (s, d) => {
        val stream = eventsStream(s, d)
        val sink = "q_stream_hourly_sink"
        val q = hourlyCounts(stream).writeStream
          .format("memory").queryName(sink)
          .outputMode(OutputMode.Complete)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink).orderBy("hour_ts", "event_type")
      },
      Some(s"""SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_ts,
              event_type, COUNT(*) AS n, ${Arith.sqlSum("value")} AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY hour_ts, event_type""")),

    // Streaming top-k: the serve-side leaderboard pattern. Structured
    // Streaming cannot run a rank window over a streaming aggregate
    // (non-time-window aggregation chains are unsupported), and the
    // PRODUCTION shape doesn't want it to: the stream maintains the
    // per-(hour, type) counts incrementally (state = active groups), and
    // the rank is computed AT READ TIME over the materialized aggregate —
    // here a row_number cut over the memory sink after the drain, at
    // 100 TB the same query over the sink table. The oracle ranks the
    // batch twin identically (ties → event_type asc).
    Q("q_stream_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stream = eventsStream(s, d)
        val sink = "q_stream_topk_sink"
        val q = hourlyCounts(stream).writeStream
          .format("memory").queryName(sink)
          .outputMode(OutputMode.Complete)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val w = Window.partitionBy("hour_ts")
          .orderBy(col("n").desc, col("event_type"))
        s.table(sink)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("hour_ts"), col("rk"), col("event_type"), col("n"))
          .orderBy("hour_ts", "rk")
      },
      Some("""SELECT hour_ts, CAST(rk AS INTEGER) AS rk, event_type, n
              FROM (
                SELECT hour_ts, event_type, n,
                  row_number() OVER (PARTITION BY hour_ts
                    ORDER BY n DESC, event_type) AS rk
                FROM (
                  SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
                    AS BIGINT) AS hour_ts, event_type, COUNT(*) AS n
                  FROM events GROUP BY 1, 2))
              WHERE rk <= 3 ORDER BY hour_ts, rk""")),

    // Sliding windows on the stream (Complete-mode memory sink like
    // q_stream_hourly, so ALL windows emit and the oracle is the plain
    // batch sliding aggregation — q_events_sliding's SQL verbatim).
    Q("q_stream_sliding",
      (s, d) => {
        val stream = eventsStream(s, d)
        val sink = "q_stream_sliding_sink"
        val q = slidingCounts(stream).writeStream
          .format("memory").queryName(sink)
          .outputMode(OutputMode.Complete)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink).orderBy("win_start", "event_type")
      },
      Some(s"""WITH x AS (
                SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800
                       AS BIGINT) AS w0, event_type, value
                FROM events),
              u AS (
                SELECT w0 AS win_start, event_type, value FROM x
                UNION ALL
                SELECT w0 - 1800, event_type, value FROM x)
              SELECT win_start, event_type, COUNT(*) AS n,
                ${Arith.sqlSum("value")} AS sum_value
              FROM u GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // Append-mode parquet sink — the PRODUCTION sink shape (q_stream_hourly's
    // memory/Complete sink is the harness-bounded variant): each window row
    // is written exactly once, when the watermark passes the window end and
    // the aggregate can no longer change; state for the window is reclaimed
    // at the same moment. AvailableNow drains the data in one micro-batch,
    // then the no-data batch advances the watermark to (max event time − 1h)
    // and flushes every closed window to the files. Windows the watermark
    // has not passed (the trailing hour of the data) remain open and
    // UNWRITTEN — the oracle is the batch twin restricted to exactly those
    // closed windows.
    Q("q_stream_hourly_append",
      (s, d) => {
        val stream = eventsStream(s, d)
        val outDir = java.nio.file.Files
          .createTempDirectory(scratchRoot, "append-out").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory(scratchRoot, "append-ckpt").toString
        val q = hourlyCounts(stream).writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(outDir).orderBy("hour_ts", "event_type")
      },
      // closed window ⇔ window end ≤ watermark = max(ts) − 1h. Spark's
      // event-time stats FLOOR the max to milliseconds before the delay is
      // subtracted (EventTimeWatermarkExec tracks ms), so the oracle floors
      // the same way — an exact-microsecond watermark would disagree for
      // data whose max lands within 1 ms above a window boundary + delay
      Some(s"""WITH wm AS (
                SELECT (MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000) * 1000
                  - 3600000000 AS wm_us FROM events),
              g AS (
                SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                    AS hour_ts,
                  event_type, COUNT(*) AS n,
                  ${Arith.sqlSum("value")} AS sum_value
                FROM events GROUP BY 1, 2)
              SELECT g.hour_ts, g.event_type, g.n, g.sum_value
              FROM g, wm
              WHERE (g.hour_ts + 3600) * 1000000 <= wm.wm_us
              ORDER BY hour_ts, event_type""")),

    // Stream-static enrichment as a driver row: the events STREAM joins
    // the customer dimension (broadcast per micro-batch — the static side
    // re-reads, so slowly-changing dims stay fresh; the stream never
    // shuffles for the join), then aggregates per segment. The oracle is
    // the identical batch join. Left join: events whose user_id has no
    // customer row land in a NULL segment bucket, which the oracle keeps.
    Q("q_stream_enrich",
      (s, d) => {
        val stream = eventsStream(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value"))
        // through the Tables loader like every batch query — it is the
        // single point where per-table read quirks live
        val customers = graft.Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        val sink = "q_stream_enrich_sink"
        val q = enrich(stream, customers)
          .groupBy("segment")
          .agg(count(lit(1)).as("n"), Arith.dsum(col("value")).as("sum_value"))
          .writeStream
          .format("memory").queryName(sink)
          .outputMode(OutputMode.Complete)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink).orderBy(col("segment").asc_nulls_first)
      },
      Some(s"""SELECT c_mktsegment AS segment, COUNT(*) AS n,
              ${Arith.sqlSum("value")} AS sum_value
              FROM events LEFT JOIN customer ON user_id = c_custkey
              GROUP BY c_mktsegment
              ORDER BY segment NULLS FIRST""")),

    // Streaming exact dedup: the LLM-pipeline dedup surface on a stream.
    // dropDuplicates keeps ONE state row per distinct key and emits each
    // key's first arrival — state is bounded by key CARDINALITY (here
    // users × event types), the same bound as any exact dedup; a
    // content-hash variant carries a 32-byte digest per distinct document.
    // (For time-bounded retention Spark offers
    // dropDuplicatesWithinWatermark — different semantics: re-admits a key
    // once the watermark passes it, so its batch twin is windowed DISTINCT,
    // not global DISTINCT.) Emitted rows are exactly the distinct keys, so
    // the oracle is plain SELECT DISTINCT.
    // The WithinWatermark dedup variant as a driver row: state is
    // bounded by keys active in the watermark horizon (eviction at
    // event time + delay) instead of global key cardinality — the shape
    // an unbounded key domain needs at 100 TB. On an AvailableNow
    // single-data-batch drain no key is ever evicted mid-stream, so the
    // emitted rows are exactly the distinct keys and the oracle is the
    // same DISTINCT as q_stream_dedup (contract enforced loudly below);
    // the EVICTION + RE-ADMISSION semantics that need a multi-batch
    // feed are pinned in StreamingSpec instead.
    Q("q_stream_dedup_wm",
      (s, d) => {
        val stream = eventsStream(s, d)
        val sink = "q_stream_dedup_wm_sink"
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try stream.select(col("user_id"), col("event_type"), col("ts"))
            .withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark("user_id", "event_type")
            .writeStream
            .format("memory").queryName(sink)
            .outputMode(OutputMode.Append)
            .trigger(Trigger.AvailableNow())
            .start()
          finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches > 1) throw new IllegalStateException(
          s"q_stream_dedup_wm drained in $dataBatches data batches; " +
            "the single-batch DISTINCT oracle contract is void")
        s.table(sink).select(col("user_id"), col("event_type"))
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type""")),

    Q("q_stream_dedup",
      (s, d) => {
        val stream = eventsStream(s, d)
        val sink = "q_stream_dedup_sink"
        // state-store count tracks key cardinality, not core count (the
        // q_stream_join rationale); restored after query start
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try stream.select(col("user_id"), col("event_type"))
            .dropDuplicates("user_id", "event_type")
            .writeStream
            .format("memory").queryName(sink)
            .outputMode(OutputMode.Append)
            .trigger(Trigger.AvailableNow())
            .start()
          finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        q.awaitTermination()
        s.table(sink).orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
              ORDER BY user_id, event_type""")),

    // The custom-state operator as a driver row: flatMapGroupsWithState
    // sessionization over the events stream (exercising arbitrary
    // stateful logic rather than built-in stateful operators —
    // the batch twin q_sessionize uses a lag window, so the two
    // formulations cross-check each other). AvailableNow drains the data
    // as ONE micro-batch (every gap-closed session emits), then the
    // no-data batch advances the watermark to max−30min and fires the
    // EVENT-TIME TIMEOUTS: an idle final session flushes iff its timeout
    // (end+gap, in watermark MILLISECONDS — Spark tracks event-time
    // state in ms) lies strictly below that watermark. The oracle
    // recomputes exactly that: all lag-window sessions, minus each
    // user's last UNLESS ⌊max⌋ms − ⌊end⌋ms > 3,600,000 (delay + gap) —
    // so the row pins the timeout arithmetic, ms flooring and strict
    // inequality included, cross-engine.
    Q("q_stream_sessionize",
      (s, d) => runSessionizeRow(s, d, "q_stream_sessionize_sink",
        "q_stream_sessionize", sessionize, requireRocks = false),
      Some(sessionizeOracleSql)),

    // [[sessionizeTws]] (the Spark 4 transformWithState rewrite of the
    // arm above) held to the SAME DuckDB oracle VERBATIM — the timer
    // arithmetic, ms flooring and strict watermark inequality must all
    // survive the API translation (explicit registerTimer vs
    // setTimeoutTimestamp) for this row to hash-match. Runs on the
    // RocksDB state-store provider, a transformWithState requirement;
    // the progress metrics are checked so a silent fallback to the
    // default provider fails the row rather than passing vacuously.
    Q("q_stream_sessionize_tws",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
        try runSessionizeRow(s, d, "q_stream_sessionize_tws_sink",
          "q_stream_sessionize_tws", sessionizeTws, requireRocks = true)
        finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some(sessionizeOracleSql)),

    // Streaming funnel snapshot: the per-user three-stage state machine
    // ([[funnelSnapshot]]) flushed by the watermark timeout in the no-data
    // batch, then the per-user flags aggregated to the same three counts
    // as the batch twin — whose oracle SQL this row reuses VERBATIM: on a
    // single-data-batch drain the snapshot sees every event, so streaming
    // must equal batch exactly. The single-batch contract is enforced
    // loudly (q_stream_sessionize's posture).
    Q("q_stream_funnel",
      (s, d) => runFunnelSnapshotRow(s, d, "q_stream_funnel_sink",
        "q_stream_funnel", funnelSnapshot, requireRocks = false),
      Some(funnelSnapshotOracleSql)),

    // [[funnelSnapshotTws]] (the transformWithState rewrite of the arm
    // above) held to the SAME DuckDB oracle VERBATIM — the third
    // dual-arm stateful pair: with the sessionizer (emit-on-close
    // session state) and the retained funnel (delta snapshots + TTL)
    // this also covers the emit-and-remove snapshot machine on both
    // Spark 4 arbitrary-state APIs. RocksDB provider required and
    // verified via progress metrics (the q_stream_sessionize_tws
    // posture).
    Q("q_stream_funnel_tws",
      (s, d) => {
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(key)
        s.conf.set(key, "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
        try runFunnelSnapshotRow(s, d, "q_stream_funnel_tws_sink",
          "q_stream_funnel_tws", funnelSnapshotTws, requireRocks = true)
        finally prev match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      },
      Some(funnelSnapshotOracleSql)),

    // Stream-stream join as a driver row: two file-source streams over the
    // same events data (clicks / purchases), joined with watermarks and an
    // event-time range, drained via AvailableNow. The oracle is the plain
    // batch join over MICROSECOND epochs on both sides (the parquet is
    // nanos; both engines compare after the same truncation).
    Q("q_stream_join",
      (s, d) => {
        def src = eventsStream(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val sink = "q_stream_join_sink"
        val joined = clickToPurchase(
          src.filter(col("event_type") === "click"),
          src.filter(col("event_type") === "purchase"))
        // state-store instances should track KEY cardinality (150 users),
        // not core count: every stateful partition pays per-batch commit
        // I/O, and 32 stores for 150 keys is 4× slower than 8. The value
        // is captured at query start, so restoring it after is safe.
        val prevParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try joined.writeStream
            .format("memory").queryName(sink)
            .outputMode(OutputMode.Append)
            .trigger(Trigger.AvailableNow())
            .start()
          finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
        q.awaitTermination()
        s.table(sink)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            unix_micros(col("click_ts")).as("click_us"),
            unix_micros(col("purchase_ts")).as("purchase_us"))
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, event_type,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
                FROM events)
              SELECT c.user_id, c.event_id AS click_id,
                p.event_id AS purchase_id,
                c.us AS click_us, p.us AS purchase_us
              FROM e c JOIN e p ON c.user_id = p.user_id
                AND c.event_type = 'click' AND p.event_type = 'purchase'
                AND p.us >= c.us AND p.us <= c.us + 1800000000
              ORDER BY c.user_id, click_id, purchase_id""")),

    // Streaming corpus curation: the q_corpus_pipeline stage chain run
    // INCREMENTALLY — doc_id-ordered micro-batches through foreachBatch,
    // per-batch minlen → quality → exact/near dedup against the
    // accumulated stage-3 state (the q_dedup_incremental machinery on
    // persisted hash/shingle/band state), survivors and counts written
    // idempotently per batch id. Held to the BATCH pipeline's oracle
    // verbatim on the final corpus state — the composed shape a
    // production training-data system runs: curation + exactly-once
    // streaming in one arm (machinery in operators/Dedup.scala; the
    // hard-kill/resume proof is StreamKillMain phase=corpuskill).
    Q("q_stream_corpus_pipeline",
      (s, d) => {
        val Dedup = graft.operators.Dedup
        val scratch = java.nio.file.Files
          .createTempDirectory(scratchRoot, "corpus").toString
        Dedup.stageCorpusFeed(s, d, 6, s"$scratch/feed")
        // NOTE: unlike the stateful rows, this row keeps the session's
        // shuffle partitions — measured 19.2 s at 8 partitions vs 13.7 s
        // at 32 (fresh-JVM BenchOne min-of-3): the per-batch minhash
        // kernel is CPU-bound and wants the cores, and there is no state
        // store paying per-partition commit I/O to economize on
        val q = Dedup.startCorpusStream(s, s"$scratch/feed", scratch)
        q.awaitTermination()
        // the row only proves incrementality if the drain really was
        // multi-batch — a single-batch degenerate run is the batch
        // pipeline in disguise and must fail loudly, not pass silently
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches < 3) throw new IllegalStateException(
          s"q_stream_corpus_pipeline drained in $dataBatches data " +
            "batches; the incremental contract needs >= 3")
        Dedup.corpusStreamResult(s, scratch)
      },
      Some(graft.operators.Dedup.CorpusPipelineOracleSql)),

    // Streaming IVF index maintenance: the ANN analog of
    // q_stream_corpus_pipeline (r17 verdict item 4) — vec_id-ordered
    // embedding micro-batches through foreachBatch, batch 0 freezes the
    // IVF centroid frame, every batch assigns to the frozen buckets and
    // accumulates exact integer per-bucket partials (occupancy, micro
    // cosine sums, per-dim vector sums); the assembled report — per
    // bucket n_vecs / mean_cos / min_cos / centroid-DRIFT — is held to
    // the one-pass batch twin's DuckDB oracle exactly (machinery in
    // operators/Similarity.scala; hard-kill/resume proof is
    // StreamKillMain phase=annkill/annresume; compaction reuses the
    // corpus stream's marker/sweep grammar via Dedup.compactStateKinds).
    Q("q_stream_ann_index",
      (s, d) => {
        val Sim = graft.operators.Similarity
        val scratch = java.nio.file.Files
          .createTempDirectory(scratchRoot, "annidx").toString
        Sim.stageEmbedFeed(s, d, 6, s"$scratch/feed")
        val q = Sim.startAnnIndexStream(s, s"$scratch/feed", scratch)
        q.awaitTermination()
        // incrementality contract, enforced loudly (the corpus-stream
        // rule): a single-batch drain is the batch twin in disguise
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches < 3) throw new IllegalStateException(
          s"q_stream_ann_index drained in $dataBatches data " +
            "batches; the incremental contract needs >= 3")
        Sim.annIndexStreamResult(s, scratch)
      },
      Some(graft.operators.Similarity.AnnIndexStreamOracleSql)),

    // The drift TRAJECTORY the final index report collapses: per
    // (batch, bucket) occupancy + cumulative occupancy + cumulative
    // centroid drift — the when-to-retrain curve over stream age. Same
    // machinery and state as q_stream_ann_index (partials carry their
    // batch id, so the report survives compaction); the oracle
    // recomputes the feed's id-range batch boundaries arithmetically
    // and windows the same integer partials.
    Q("q_stream_ann_drift",
      (s, d) => {
        val Sim = graft.operators.Similarity
        val scratch = java.nio.file.Files
          .createTempDirectory(scratchRoot, "anndrift").toString
        Sim.stageEmbedFeed(s, d, 6, s"$scratch/feed")
        val q = Sim.startAnnIndexStream(s, s"$scratch/feed", scratch)
        q.awaitTermination()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        if (dataBatches < 3) throw new IllegalStateException(
          s"q_stream_ann_drift drained in $dataBatches data " +
            "batches; the incremental contract needs >= 3")
        Sim.annIndexDriftResult(s, scratch)
      },
      Some(graft.operators.Similarity.sqlAnnDriftOracle(6))))

  /** The shared drain recipe for both sessionizer rows: file-source
    * stream → the given sessionizer arm → memory sink via AvailableNow,
    * with the single-data-batch oracle contract enforced loudly. */
  private def runSessionizeRow(s: org.apache.spark.sql.SparkSession,
      d: String, sink: String, rowName: String,
      arm: Dataset[Ev] => Dataset[Session],
      requireRocks: Boolean): DataFrame = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val stream = eventsStream(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .as[Ev]
    // state stores track user cardinality, not core count (the
    // q_stream_join rationale); value restored after query start
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try arm(stream).writeStream
        .format("memory").queryName(sink)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    q.awaitTermination()
    // the oracle's timeout rule assumes ONE data micro-batch (the
    // watermark must not advance mid-data, or within-horizon late
    // rows drop and the batch-twin comparison silently diverges) —
    // enforced loudly rather than assumed: a future file layout
    // that splits the drain fails here, not in a hash mismatch
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    if (dataBatches > 1) throw new IllegalStateException(
      s"$rowName drained in $dataBatches data batches; " +
        "the single-batch oracle contract is void")
    if (requireRocks) {
      val usedRocks = q.recentProgress.flatMap(_.stateOperators)
        .exists(_.customMetrics.keySet.asScala.exists(_.contains("rocksdb")))
      if (!usedRocks) throw new IllegalStateException(
        s"$rowName: no rocksdb custom metrics in progress — the " +
          "required state-store provider did not take effect")
    }
    s.table(sink)
      .select(col("user_id"), col("n_events"), col("start_us"),
        col("end_us"))
      .orderBy("user_id", "start_us")
  }

  /** Shared body of q_stream_funnel[_tws]: drain the events stream
    * through the given snapshot-funnel arm, enforce the single-data-batch
    * oracle contract (and the RocksDB provider when required), and
    * aggregate the per-user flags to the batch twin's three counts. */
  private def runFunnelSnapshotRow(s: org.apache.spark.sql.SparkSession,
      d: String, sink: String, rowName: String,
      arm: Dataset[FEv] => Dataset[FunnelUser],
      requireRocks: Boolean): DataFrame = {
    import s.implicits._
    import scala.jdk.CollectionConverters._
    val stream = eventsStream(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[FEv]
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try arm(stream).writeStream
        .format("memory").queryName(sink)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow())
        .start()
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    q.awaitTermination()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    if (dataBatches > 1) throw new IllegalStateException(
      s"$rowName drained in $dataBatches data batches; " +
        "the single-batch oracle contract is void")
    if (requireRocks) {
      val usedRocks = q.recentProgress.flatMap(_.stateOperators)
        .exists(_.customMetrics.keySet.asScala.exists(_.contains("rocksdb")))
      if (!usedRocks) throw new IllegalStateException(
        s"$rowName: no rocksdb custom metrics in progress — the " +
          "required state-store provider did not take effect")
    }
    s.table(sink).agg(
      count_if(col("s1")).as("n_signup"),
      count_if(col("s2")).as("n_click"),
      count_if(col("s3")).as("n_purchase"))
  }

  /** The q_stream_funnel[_tws] oracle — the batch funnel counts (stage
    * k's earliest qualifying instant is a MIN over events strictly later
    * than stage k−1's clock). Shared verbatim so the two API arms are
    * held to one bar. */
  private lazy val funnelSnapshotOracleSql: String =
    """WITH ev AS (
         SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us
         FROM events),
       t1 AS (SELECT user_id, MIN(us) AS t1 FROM ev
              WHERE event_type = 'signup' GROUP BY user_id),
       t2 AS (SELECT ev.user_id, MIN(us) AS t2
              FROM ev JOIN t1 USING (user_id)
              WHERE event_type = 'click' AND us > t1
              GROUP BY ev.user_id),
       t3 AS (SELECT ev.user_id, MIN(us) AS t3
              FROM ev JOIN t2 USING (user_id)
              WHERE event_type = 'purchase' AND us > t2
              GROUP BY ev.user_id)
       SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) AS n_signup,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) AS n_click,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM t3) AS n_purchase"""

  /** The q_stream_sessionize[_tws] oracle — see the registration comment
    * for the timeout-rule derivation. Shared so the two API arms are held
    * to ONE cross-engine contract, character for character. */
  private lazy val sessionizeOracleSql: String = """WITH g AS (
                SELECT user_id, event_id,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS eus,
                  epoch_us(CAST(ts AS TIMESTAMP)) -
                    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                      (PARTITION BY user_id
                       ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                      AS gap_us
                FROM events),
              sid AS (
                SELECT user_id, eus,
                  CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                                THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY eus, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
                FROM g),
              sess AS (
                SELECT user_id, session_id, COUNT(*) AS n_events,
                  MIN(eus) AS start_us, MAX(eus) AS end_us
                FROM sid GROUP BY user_id, session_id),
              wm AS (
                SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_us
                FROM events),
              lastflag AS (
                SELECT s.*, row_number() OVER (PARTITION BY user_id
                    ORDER BY start_us DESC) = 1 AS is_last
                FROM sess s)
              SELECT user_id, n_events, start_us, end_us
              FROM lastflag, wm
              WHERE NOT is_last
                 OR (max_us // 1000) - (end_us // 1000) > 3600000
              ORDER BY user_id, start_us"""
}
