package graft.operators

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.StreamingOps

/** Batch entries for the streaming transforms (unified API: the exact
  * same functions run under readStream — StreamingOpsSpec proves the
  * streaming path agrees with these batch results). Oracle-checked
  * here so the shared logic is value-verified against DuckDB.
  */
object StreamQueries {

  val all: Seq[QueryDef] = Seq(

    // Tumbling 15-minute window per event type. window() aligns to
    // the epoch, so the oracle reproduces it with integer-micro
    // bucket arithmetic.
    QueryDef(
      "s01_tumbling_window_agg",
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000)
        |         AS bucket_start,
        |       event_type, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |         AS sum_value
        |FROM events GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin) { (s, d) =>
      StreamingOps.tumblingAgg(Tables.events(s, d), "15 minutes")
        .orderBy("bucket_start", "event_type")
    },

    // Gap-based sessionization (30-min inactivity), one row per
    // session with exact micro timestamps — the batch twin of the
    // flatMapGroupsWithState stream in StreamingOps.
    QueryDef(
      "s02_session_stats",
      """WITH s AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |             lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |               ORDER BY ts, event_id) AS prev_us
        |           FROM events),
        |t AS (SELECT user_id, event_id, us,
        |        CASE WHEN prev_us IS NOT NULL AND us - prev_us <= 1800000000
        |             THEN 0 ELSE 1 END AS ns
        |      FROM s),
        |u AS (SELECT user_id, us,
        |        CAST(sum(ns) OVER (PARTITION BY user_id
        |          ORDER BY us, event_id) AS INT) AS session_no
        |      FROM t)
        |SELECT user_id, session_no, count(*) AS n_events,
        |       min(us) AS start_us, max(us) AS end_us
        |FROM u GROUP BY user_id, session_no
        |ORDER BY user_id, session_no""".stripMargin) { (s, d) =>
      StreamingOps.sessionStatsBatch(Tables.events(s, d))
        .orderBy("user_id", "session_no")
    },

    // Sliding 30-minute window hopping every 15 minutes: each event
    // belongs to exactly two windows — the one starting at its
    // 15-minute bucket and the one 15 minutes earlier. The oracle
    // reproduces window()'s fan-out with a two-branch UNION ALL over
    // integer-micro bucket arithmetic.
    QueryDef(
      "s03_sliding_window_agg",
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |w AS (SELECT (us // 900000000) * 900000000 AS ws, event_type, value
        |      FROM e
        |      UNION ALL
        |      SELECT (us // 900000000) * 900000000 - 900000000, event_type,
        |             value
        |      FROM e)
        |SELECT make_timestamp(ws) AS window_start, event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |         AS sum_value
        |FROM w GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      StreamingOps.slidingAgg(Tables.events(s, d), "30 minutes", "15 minutes")
        .orderBy("window_start", "event_type")
    },

    // Keep-first dedup (batch form of dropDuplicatesWithinWatermark —
    // see StreamingOps.dedupStreamWithinWatermark). The order key is
    // epoch MICROS on both sides: the loader normalizes every fixture
    // generation's ts storage to micros (Tables.normalizeEventsTs), and
    // ordering on the post-normalization value keeps the winner
    // identical across engines when two events share a microsecond.
    QueryDef(
      "s04_dedup_first",
      """SELECT user_id, event_type, first_us, first_event_id FROM (
        |  SELECT user_id, event_type,
        |         CAST(epoch_us(ts) AS BIGINT) AS first_us,
        |         event_id AS first_event_id,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |             ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      StreamingOps.dedupFirstBatch(Tables.events(s, d))
        .orderBy("user_id", "event_type")
    },

    // Interval (time-bounded stream-stream) join: each click joins the
    // views by the SAME user in the preceding hour — the attribution
    // shape Structured Streaming runs as a watermarked stream-stream
    // join with bounded state (StreamingOpsSpec proves the streaming
    // twin equals this batch form). Scale: the equi-key (user_id)
    // carries the shuffle; the time bound is applied post-join per
    // key pair, and in streaming it is what lets the engine expire
    // state — no unbounded buffering.
    QueryDef(
      "s05_interval_join",
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        |       epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts <= c.ts AND c.ts < v.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
          col("ts").as("view_ts"))
      clicks.join(views,
          col("user_id") === col("v_user_id")
            && col("view_ts") <= col("click_ts")
            && col("click_ts") < col("view_ts") + expr("interval 1 hour"))
        .select(col("click_id"), col("view_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("view_ts")).as("view_us"))
        .orderBy("click_id", "view_id")
    },

    // Per-window distinct users — streaming-wise this is the chained
    // dedup→agg pattern (two stateful operators); the batch form here
    // is one distinct + one count, both shuffling on the same
    // (bucket, user) key family. StreamingOpsSpec proves the
    // streaming twin (windowDistinctUsersStream) emits the identical
    // finalized windows under append mode.
    QueryDef(
      "s06_window_distinct_users",
      """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000)
        |         AS bucket_start,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY bucket_start""".stripMargin) {
      (s, d) =>
      StreamingOps.windowDistinctUsersBatch(Tables.events(s, d), "15 minutes")
        .orderBy("bucket_start")
    },

    // LEFT OUTER interval join — s05's attribution shape with the
    // unmatched side KEPT (clicks with no preceding-hour view emit a
    // null-padded row): the outer stream-stream join is its own
    // Structured Streaming surface, because the null row can only be
    // emitted once the watermark proves no matching view can still
    // arrive — state eviction IS the outer-emit trigger
    // (StreamingOpsSpec drives the streaming twin with a sentinel
    // event that advances the watermark past every open window and
    // proves it equals this batch form). Scale: identical to s05 —
    // the user_id equi-key carries the shuffle, the time bound
    // bounds streaming state; the outer side adds one
    // watermark-delay window of unmatched-left state, still
    // time-bounded.
    QueryDef(
      "s07_interval_join_outer",
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        |       epoch_us(c.ts) AS click_us, epoch_us(v.ts) AS view_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND v.ts <= c.ts AND c.ts < v.ts + INTERVAL 1 HOUR
        |ORDER BY click_id, view_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
          col("ts").as("view_ts"))
      clicks.join(views,
          col("user_id") === col("v_user_id")
            && col("view_ts") <= col("click_ts")
            && col("click_ts") < col("view_ts") + expr("interval 1 hour"),
          "left_outer")
        .select(col("click_id"), col("view_id"), col("user_id"),
          unix_micros(col("click_ts")).as("click_us"),
          unix_micros(col("view_ts")).as("view_us"))
        .orderBy("click_id", "view_id")
    },
  )
}
