package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowing + keyed sessionization.
  *
  * These are the batch-checkable faces of the streaming surface:
  * `window()` / `session_window()` run identically in batch and
  * streaming plans, and `flatMapGroupsWithState` is the exact operator
  * the FireWatch-parity video pipeline uses for its per-video state
  * machine (gap-based session close + running stats — reference
  * streams/stream.py:341-386). Checking them against the DuckDB oracle
  * here validates the same code paths the streaming jobs use.
  *
  * Scale notes: sessionization shuffles once on the key; state per key
  * is O(1) (running aggregates, not buffered events) except the batch
  * fMGWS path which sorts one group at a time. At 100 TB the streaming
  * variant runs with RocksDB state store + watermark eviction.
  */
object SessionQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  // Input/output rows for the stateful sessionizer.
  final case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionOut(
      user_id: Long, sid: Long, n: Long, v_sum: Double,
      start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Microseconds since epoch — `getTime` alone truncates to ms while
    * the events table and the DuckDB oracle are µs-precision: an event
    * pair whose true gap straddles the boundary only in its sub-ms
    * component would sessionize differently under ms math. */
  def usOf(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** Gap-based sessionizer over one key's events (sorted by ts,
    * event_id): splits when the gap exceeds `gapMs`. Mirrors the
    * reference's count-gap session close generalized to event time. */
  def sessionize(userId: Long, sorted: Seq[Ev], gapMs: Long): Seq[SessionOut] = {
    if (sorted.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    val gapUs = gapMs * 1000
    var sid = 1L
    var n = 0L
    var vSum = 0.0
    var start = sorted.head.ts
    var prev = sorted.head.ts
    def flush(end: java.sql.Timestamp): Unit = {
      // Same rounding mode as Spark's round() (HALF_UP on BigDecimal).
      val rounded = BigDecimal(vSum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      out += SessionOut(userId, sid, n, rounded, start, end)
    }
    sorted.foreach { e =>
      if (usOf(e.ts) - usOf(prev) > gapUs) {
        flush(prev); sid += 1; n = 0L; vSum = 0.0; start = e.ts
      }
      n += 1; vSum += e.value; prev = e.ts
    }
    flush(prev)
    out.toSeq
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- tumbling window ----
    sql(
      "q_window_tumbling",
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
        |       count(*) AS n, round(sum(value), 2) AS v_sum
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY w_start, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_sum"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("v_sum"))
        .orderBy("w_start", "event_type")
    },

    // ---- sliding window (1 h window, 30 min slide → 2 windows/event) ----
    sql(
      "q_window_sliding",
      """WITH b AS (SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value
        |           FROM events),
        |     w AS (SELECT ws AS w_start, event_type, value FROM b
        |           UNION ALL
        |           SELECT ws - INTERVAL 30 MINUTE AS w_start, event_type, value FROM b)
        |SELECT w_start, event_type, count(*) AS n, round(sum(value), 2) AS v_sum
        |FROM w GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_sum"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("v_sum"))
        .orderBy("w_start", "event_type")
    },

    // ---- DYNAMIC-gap session window: the gap depends on the event
    //      (purchases hold a session open 20 min, everything else 10)
    //      — session_window with a gap EXPRESSION. The oracle replica
    //      generalizes gaps-and-islands: a session breaks only when ts
    //      EXCEEDS the running max of previous events' (ts + gap) —
    //      Spark merges an event arriving exactly at the session end
    //      (UpdatingSessionsIterator splits on start > end) — and the
    //      session end is the max (ts + gap) of its members. ----
    sql(
      "q_session_dynamic_gap",
      """WITH x AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN event_type = 'purchase' THEN INTERVAL 20 MINUTE
        |              ELSE INTERVAL 10 MINUTE END AS gap
        |  FROM events),
        |y AS (SELECT *,
        |             max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS prev_end
        |      FROM x),
        |z AS (SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end THEN 1 ELSE 0 END AS brk
        |      FROM y),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM z)
        |SELECT user_id, min(ts) AS session_start, max(ts + gap) AS session_end,
        |       count(*) AS n, round(sum(value), 2) AS v_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      // session_window's dynamic gap requires CalendarIntervalType
      // (ANSI INTERVAL literals are DayTimeIntervalType) → make_interval
      val gap = when(col("event_type") === "purchase",
          expr("make_interval(0, 0, 0, 0, 0, 20, 0)"))
        .otherwise(expr("make_interval(0, 0, 0, 0, 0, 10, 0)"))
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), gap), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_sum"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n"), col("v_sum"))
        .orderBy("user_id", "session_start")
    },

    // ---- session window (10 min gap) via built-in session_window ----
    sql(
      "q_session_window",
      """WITH x AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM x)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 10 MINUTE AS session_end,
        |       count(*) AS n, round(sum(value), 2) AS v_sum
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v_sum"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n"), col("v_sum"))
        .orderBy("user_id", "session_start")
    },

    // ---- keyed state machine: flatMapGroupsWithState sessionizer.
    //      Same operator the video pipeline uses; batch-mode checkable.
    sql(
      "q_stateful_sessions",
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                               ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS sid
        |      FROM x)
        |SELECT user_id, sid, count(*) AS n, round(sum(value), 2) AS v_sum,
        |       min(ts) AS start_ts, max(ts) AS end_ts
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sid""".stripMargin) { (s, dir) =>
      import s.implicits._
      val gapMs = 10L * 60 * 1000
      val ev: Dataset[Ev] = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value")).as[Ev]
      val fn = (uid: Long, it: Iterator[Ev], state: GroupState[Long]) => {
        // Batch mode: one invocation per key; order within the group is
        // not guaranteed, so sort (groups are bounded per key by the
        // upstream partitioning/watermark in the streaming variant).
        val sorted = it.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
        sessionize(uid, sorted, gapMs).iterator
      }
      ev.groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
        .toDF()
        .orderBy("user_id", "sid")
    }
  )
}
