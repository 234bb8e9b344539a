package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY §2.6: the reference is
  * incremental-by-date batch; this module provides the streaming
  * analog the Spark engine should expose).
  *
  * The transforms are written against plain DataFrames so the SAME
  * code runs in batch (oracle-checked via SparkEntry) and on a
  * readStream source (exercised in StreamingOpsSpec with file and
  * memory sources). That unified-API property is the point: at 100 TB
  * the batch backfill and the live stream share one implementation.
  */
object StreamingOps {

  /** Tumbling-window count/sum per event type. `window()` aligns
    * buckets to the epoch, so in batch mode the result is exactly
    * `make_timestamp((epoch_us // width) * width)` bucketing. */
  def tumblingAgg(events: DataFrame, width: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      // decimal sum: order-independent (double summation order varies
      // with partitioning and can flip round() at half-cent boundaries)
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("w.start").as("bucket_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Same aggregation with a watermark — the streaming deployment
    * form (late data beyond 1 hour is dropped; state is bounded). */
  def tumblingAggStream(events: DataFrame, width: String = "15 minutes"): DataFrame =
    tumblingAgg(events.withWatermark("ts", "1 hour"), width)

  /** Sliding (hopping) window: every event lands in width/slide
    * overlapping buckets (window() emits them as a generator before
    * the aggregate — map-side fan-out, then one shuffle on
    * (window, event_type) with partial aggregation, exactly like the
    * tumbling form). */
  def slidingAgg(events: DataFrame, width: String = "30 minutes",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
          .as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming deployment form of slidingAgg (bounded state). */
  def slidingAggStream(events: DataFrame, width: String = "30 minutes",
      slide: String = "15 minutes"): DataFrame =
    slidingAgg(events.withWatermark("ts", "1 hour"), width, slide)

  /** Keep-first event dedup, batch form: the earliest event per
    * (user_id, event_type) under the total order (event-time micros,
    * event_id). One shuffle on the key; WindowGroupLimit prunes to one
    * row per key before the final window evaluates. */
  def dedupFirstBatch(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("first_us"),
        col("event_id").as("first_event_id"))
  }

  /** Streaming form: dropDuplicatesWithinWatermark keeps the FIRST
    * ARRIVAL per key and — unlike plain dropDuplicates, whose state
    * grows with every key ever seen — evicts a key's state once the
    * watermark passes its event time, bounding state to the keys
    * active inside the watermark window. Equals dedupFirstBatch when
    * arrival order is event-time order (the replay/backfill case);
    * with disorder it keeps the first arrival, the standard streaming
    * contract. */
  def dedupStreamWithinWatermark(events: DataFrame,
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("first_us"),
        col("event_id").as("first_event_id"))

  /** Per-window distinct-user count — the ingestion-dashboard staple
    * whose streaming form needs TWO chained stateful operators
    * (supported since Spark 3.4): event-time dedup of (window, user)
    * feeding a windowed count. Including the window in the dedup key
    * is what bounds state: the watermark evicts a window's dedup set
    * once it passes, so state is O(active windows × users per
    * window), not O(users ever seen). The batch twin is the
    * oracle-checked entry (s06). */
  def windowDistinctUsersBatch(events: DataFrame,
      width: String = "15 minutes"): DataFrame =
    events
      .select(window(col("ts"), width).getField("start").as("bucket_start"),
        col("user_id"))
      .distinct()
      .groupBy("bucket_start")
      .agg(count(lit(1)).as("n_users"))

  def windowDistinctUsersStream(events: DataFrame,
      width: String = "15 minutes",
      watermarkDelay: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .withColumn("win", window(col("ts"), width))
      .dropDuplicates("win", "user_id")
      .groupBy("win")
      .agg(count(lit(1)).as("n_users"))
      .select(col("win").getField("start").as("bucket_start"),
        col("n_users"))

  /** Streaming as-of attribution: for every LEFT event (kind=1),
    * attach the timestamp of the latest RIGHT event (kind=0) of the
    * same key at-or-before it — the streaming form of the batch
    * asofJoin (plans/AsOfJoin.scala). State per key is ONE long (the
    * latest right timestamp seen), the streaming analog of the merge
    * exec's one-buffered-row state. Ordering contract like
    * sessionizeStream: agrees with the batch as-of when each key's
    * events arrive in event-time order across micro-batches (in-batch
    * disorder is sorted away).
    *
    * Input columns: (key: long, us: long, kind: int, id: long).
    * Output: (id, key, us, right_us: nullable).
    */
  final case class AsOfOut(id: Long, key: Long, us: Long,
      right_us: Option[Long])

  def asofStream(spark: SparkSession,
      events: Dataset[(Long, Long, Int, Long)]): Dataset[AsOfOut] = {
    import spark.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state: GroupState[Long]) =>
          // sort the micro-batch like the batch form's (ts, kind, id)
          // order: a simultaneous right event matches (<= semantics)
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3, r._4))
          val out = Seq.newBuilder[AsOfOut]
          var latest = state.getOption.getOrElse(Long.MinValue)
          for ((_, us, kind, id) <- sorted) {
            if (kind == 0) latest = math.max(latest, us)
            else out += AsOfOut(id, key, us,
              if (latest == Long.MinValue) None else Some(latest))
          }
          state.update(latest)
          out.result().iterator
      }
  }

  // ---- Stateful sessionization ----------------------------------

  /** `us` = event time in epoch microseconds (exact; Timestamp's
    * millisecond getTime would truncate the parquet micros). */
  final case class Ev(user_id: Long, us: Long, event_id: Long)
  final case class Session(
      user_id: Long, session_no: Int, n_events: Long,
      start_us: Long, end_us: Long)
  /** open session accumulator: events of the in-progress session plus
    * how many sessions this user has already closed. */
  final case class SessState(closed: Int, curN: Long, curStart: Long, curEnd: Long)

  /** event-time sessionizer state: non-finalized (us, event_id) buffer. */
  final case class BufState(closed: Int, buf: Seq[(Long, Long)])

  val GapUs: Long = 1800L * 1000 * 1000 // 30-minute inactivity gap

  /** Batch form: gap-based sessions via lag + running sum — one
    * shuffle on user_id, windows reuse the same sort. Output is one
    * row per session with exact micro timestamps. */
  def sessionStatsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNotNull
          && col("us") - col("prev_us") <= GapUs, 0).otherwise(1))
      .withColumn("session_no",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0))
          .cast("int"))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("start_us"), max("us").as("end_us"))
  }

  /** Event-time sessionization with watermark-buffered disorder
    * tolerance — the production form when events arrive out of order
    * across micro-batches. State per key buffers only NON-FINALIZED
    * events: a session is emitted exactly when the watermark passes
    * its end + gap (no later event inside the watermark can extend
    * it), and an EventTimeTimeout finalizes the tail when a user goes
    * idle. Events older than the watermark are dropped (documented —
    * flatMapGroupsWithState does not drop late rows itself), so the
    * result equals `sessionStatsBatch` whenever disorder stays within
    * the watermark delay.
    *
    * State size: after a user's tail session is finalized the key keeps
    * an EMPTY buffer carrying only the closed-session counter (needed
    * for session_no continuity if the user returns), so the store is
    * O(#distinct users ever seen), not O(#active users) — the same
    * deliberate retention as sessionizeStream's idle tombstones.
    *
    * Input: (user_id: long, ts: timestamp, event_id: long).
    */
  def sessionizeEventTime(spark: SparkSession, events: DataFrame,
      watermarkDelay: String = "1 day"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BufState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(BufState(0, Nil))
          // merge new in-watermark events into the buffer (micros from
          // the Timestamp: getTime millis + sub-milli nanos)
          val incoming = rows.map { case (_, ts, id) =>
            (ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L, id)
          }.filter(_._1 >= wmUs)
          val all = (st.buf ++ incoming).sortBy(identity).distinct
          // split the sorted buffer into gap-delimited sessions
          val sessions = all.foldLeft(Vector.empty[Vector[(Long, Long)]]) {
            case (acc, e) =>
              if (acc.nonEmpty && e._1 - acc.last.last._1 <= GapUs)
                acc.init :+ (acc.last :+ e)
              else acc :+ Vector(e)
          }
          // a session is final once the watermark passed its end + gap
          val (fin, open) = sessions.partition(s => s.last._1 + GapUs < wmUs)
          val out = fin.zipWithIndex.map { case (s, i) =>
            Session(userId, st.closed + 1 + i, s.size, s.head._1, s.last._1)
          }
          st = BufState(st.closed + fin.size, open.flatten)
          state.update(st)
          if (st.buf.nonEmpty)
            state.setTimeoutTimestamp((st.buf.map(_._1).max + GapUs) / 1000L + 1)
          out.iterator
      }
  }

  /** Idle-timeout transition (pure; unit-tested directly because a
    * processing-time timeout cannot fire under the deterministic
    * processAllAvailable harness): close the open session if any,
    * and keep a tombstone carrying the closed-session counter so
    * session numbering survives eviction. */
  def onIdleTimeout(userId: Long, st: SessState): (SessState, Iterator[Session]) =
    if (st.curN > 0)
      (SessState(st.closed + 1, 0L, 0L, 0L),
        Iterator(Session(userId, st.closed + 1, st.curN, st.curStart, st.curEnd)))
    else (SessState(st.closed, 0L, 0L, 0L), Iterator.empty)

  /** Streaming sessionization, processing-time form:
    * flatMapGroupsWithState with a processing-time timeout of one gap —
    * an idle user's open session is emitted when the timeout fires and
    * the key's state shrinks to a tombstone carrying only the
    * closed-session counter (session_no continuity survives the idle
    * gap; see onIdleTimeout).
    *
    * State per key is O(1) (counts + boundary timestamps; one int for
    * idle tombstones), so state store size is O(#distinct users ever
    * seen), not O(#events) — the property that matters at production
    * rates. (`idleTimeout = false` disables the timeout path — used by
    * the deterministic test harness, whose processAllAvailable cannot
    * coexist with processing-time timeouts.)
    *
    * Ordering contract: agrees exactly with `sessionStatsBatch` when
    * each user's events arrive in event-time order across
    * micro-batches (in-batch disorder is sorted away; in-session
    * disorder is absorbed via min/max extents). Full cross-batch
    * event-time disorder needs `sessionizeEventTime` above — a
    * different state shape (buffer per key) that trades the O(1)
    * state for reordering tolerance.
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Ev],
      idleTimeout: Boolean = true): Dataset[Session] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val (tomb, out) = onIdleTimeout(userId, state.get)
            // Tombstone, NOT remove(): the `closed` counter must
            // survive eviction — a user returning after the idle gap
            // would otherwise restart session_no at 1, emitting
            // duplicate (user_id, session_no) keys and diverging from
            // sessionStatsBatch. The payload shrinks to one counter;
            // state is O(#distinct users), same as the event-time form.
            state.update(tomb)
            out
          } else {
            // within a micro-batch, order events like the batch form
            val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
            var st = state.getOption.getOrElse(SessState(0, 0L, 0L, 0L))
            val out = Seq.newBuilder[Session]
            for (e <- sorted) {
              val us = e.us
              if (st.curN == 0L) {
                st = SessState(st.closed, 1L, us, us)
              } else if (us - st.curEnd <= GapUs) {
                // min/max extents absorb bounded in-session disorder
                st = st.copy(curN = st.curN + 1,
                  curStart = math.min(st.curStart, us),
                  curEnd = math.max(st.curEnd, us))
              } else {
                out += Session(userId, st.closed + 1, st.curN, st.curStart, st.curEnd)
                st = SessState(st.closed + 1, 1L, us, us)
              }
            }
            state.update(st)
            if (idleTimeout)
              state.setTimeoutDuration(GapUs / 1000) // gap, in millis
            out.result().iterator
          }
      }
  }

}
