package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: regular-grid
  * gap-filling with forward fill (the resample/ffill primitive),
  * ordered funnel analysis, and fixed-width value histograms —
  * rounding out SURVEY.md §2.2's window/aggregate families with the
  * temporal shapes an analytics user expects.
  *
  * Scale design: gap-fill generates each key's grid WITH the key
  * (sequence + explode — no cross join against a global calendar
  * table), so the expansion is partition-local after one shuffle on
  * the key; forward fill is a running last-non-null window, one sort
  * per key partition. Funnel and histogram are single hash
  * aggregations.
  */
object TemporalQueries {

  import QueryDef.sql

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- hourly resample + forward fill over a sparse series ----
    sql(
      "q_gapfill_ffill",
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value
        |           FROM events WHERE user_id % 100 = 0),
        |obs AS (SELECT user_id, h, round(avg(value), 4) AS v
        |        FROM e GROUP BY user_id, h),
        |grid AS (SELECT user_id, unnest(generate_series(min(h), max(h),
        |                                INTERVAL 1 HOUR)) AS h
        |         FROM e GROUP BY user_id)
        |SELECT g.user_id, CAST(g.h AS TIMESTAMP) AS hour,
        |       round(last_value(o.v IGNORE NULLS)
        |             OVER (PARTITION BY g.user_id ORDER BY g.h
        |                   ROWS UNBOUNDED PRECEDING), 4) AS v_filled,
        |       CASE WHEN o.v IS NULL THEN 0 ELSE 1 END AS observed
        |FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
        |ORDER BY g.user_id, hour""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .where(col("user_id") % 100 === 0)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      val obs = e.groupBy("user_id", "h").agg(round(avg(col("value")), 4).as("v"))
      // per-key grid: the sequence is built inside the key's aggregate
      // row and exploded — no global calendar cross join
      val grid = e.groupBy("user_id")
        .agg(sequence(min(col("h")), max(col("h")), expr("interval 1 hour")).as("hs"))
        .select(col("user_id"), explode(col("hs")).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "h"), "left")
        .select(
          col("user_id"), col("h").as("hour"),
          round(last(col("v"), ignoreNulls = true).over(w), 4).as("v_filled"),
          when(col("v").isNull, 0).otherwise(1).as("observed"))
        .orderBy("user_id", "hour")
    },

    // ---- hourly resample + LINEAR interpolation ----
    // The ffill twin's other half: missing grid points take the
    // straight line between the neighboring observations instead of
    // carrying the last one forward. The interpolation fraction is a
    // ratio of INTEGER grid positions (row_number over the per-key
    // grid), not timestamp arithmetic — both engines divide the same
    // small ints and scale the same doubles, so the result is
    // bit-identical without any epoch/unit reconciliation. Every
    // key's grid starts and ends at an observed hour (min/max come
    // from the observations), so prev/next always exist and no edge
    // case leaks NULLs. Same scale shape as q_gapfill_ffill: per-key
    // sequence+explode grid, per-key windows, no global stage.
    //
    // The interpolated value is computed in exact integer
    // ten-thousandths — endpoints are 4-decimal values, so scaling by
    // 10^4 gives integers the weighted sum keeps exact in a double —
    // and only ONE final division rounds. `pv + (nv-pv)*frac` instead
    // lands NEAR the half-boundary of round(·,4), where Spark's
    // exact-BigDecimal rounding and DuckDB's scaled-multiply rounding
    // disagree on the last digit (caught at sf0.01 row 493). ----
    sql(
      "q_resample_interp",
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h, value
        |           FROM events WHERE user_id % 100 = 0),
        |obs AS (SELECT user_id, h, round(avg(value), 4) AS v
        |        FROM e GROUP BY user_id, h),
        |grid AS (SELECT user_id, unnest(generate_series(min(h), max(h),
        |                                INTERVAL 1 HOUR)) AS h
        |         FROM e GROUP BY user_id),
        |g2 AS (SELECT g.user_id, g.h, o.v,
        |              row_number() OVER (PARTITION BY g.user_id
        |                                 ORDER BY g.h) AS pos
        |       FROM grid g LEFT JOIN obs o
        |         ON o.user_id = g.user_id AND o.h = g.h),
        |f AS (SELECT user_id, h, v, pos,
        |             last_value(v IGNORE NULLS) OVER wp AS pv,
        |             last_value(CASE WHEN v IS NOT NULL THEN pos END
        |                        IGNORE NULLS) OVER wp AS pp,
        |             first_value(v IGNORE NULLS) OVER wn AS nv,
        |             first_value(CASE WHEN v IS NOT NULL THEN pos END
        |                         IGNORE NULLS) OVER wn AS np
        |      FROM g2
        |      WINDOW wp AS (PARTITION BY user_id ORDER BY h
        |                    ROWS UNBOUNDED PRECEDING),
        |             wn AS (PARTITION BY user_id ORDER BY h
        |                    ROWS BETWEEN CURRENT ROW
        |                             AND UNBOUNDED FOLLOWING))
        |SELECT user_id, CAST(h AS TIMESTAMP) AS hour,
        |       CASE WHEN v IS NOT NULL THEN v
        |            ELSE round((round(pv * 10000) * CAST(np - pos AS DOUBLE)
        |                        + round(nv * 10000) * CAST(pos - pp AS DOUBLE))
        |                       / CAST(np - pp AS DOUBLE)) / 10000.0
        |       END AS v_interp,
        |       CASE WHEN v IS NULL THEN 0 ELSE 1 END AS observed
        |FROM f
        |ORDER BY user_id, hour""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .where(col("user_id") % 100 === 0)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      val obs = e.groupBy("user_id", "h").agg(round(avg(col("value")), 4).as("v"))
      val grid = e.groupBy("user_id")
        .agg(sequence(min(col("h")), max(col("h")), expr("interval 1 hour")).as("hs"))
        .select(col("user_id"), explode(col("hs")).as("h"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("h"))
      val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsPos = when(col("v").isNotNull, col("pos"))
      grid.join(obs, Seq("user_id", "h"), "left")
        .withColumn("pos", row_number().over(wOrd))
        .select(col("user_id"), col("h"), col("v"), col("pos"),
          last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
          last(obsPos, ignoreNulls = true).over(wPrev).as("pp"),
          first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
          first(obsPos, ignoreNulls = true).over(wNext).as("np"))
        .select(
          col("user_id"), col("h").as("hour"),
          when(col("v").isNotNull, col("v"))
            .otherwise(round(
              (round(col("pv") * 10000, 0) * (col("np") - col("pos")).cast("double")
                + round(col("nv") * 10000, 0) * (col("pos") - col("pp")).cast("double"))
                / (col("np") - col("pp")).cast("double"), 0) / 10000.0)
            .as("v_interp"),
          when(col("v").isNull, 0).otherwise(1).as("observed"))
        .orderBy("user_id", "hour")
    },

    // ---- ordered funnel: view → click → purchase, strict order ----
    sql(
      "q_funnel",
      """WITH s AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |  min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |  min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |       count(t_view) AS n_view,
        |       count(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
        |       count(CASE WHEN t_purchase > t_click AND t_click > t_view
        |             THEN 1 END) AS n_full_funnel
        |FROM s""".stripMargin) { (s, dir) =>
      val st = t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      st.agg(
        count(lit(1)).as("n_users"),
        count(col("t_view")).as("n_view"),
        count(when(col("t_click") > col("t_view"), 1)).as("n_view_click"),
        count(when(col("t_purchase") > col("t_click")
          && col("t_click") > col("t_view"), 1)).as("n_full_funnel"))
    },

    // ---- time-windowed funnel: each step within 24 h of the prior ----
    // The conversion-window variant of q_funnel: a click only counts
    // within 24 h of the user's first view, a purchase within 24 h of
    // that qualifying click — the attribution-window semantics every
    // marketing funnel actually uses (the unbounded funnel overcounts
    // conversions that happen weeks later). Three per-user min
    // aggregations chained by semi-ish joins on the per-user frames;
    // the corpus collapses at step one and every later step joins
    // #users-sized frames.
    sql(
      "q_funnel_windowed",
      """WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id AS user_id, min(e.ts) AS first_click
        |      FROM events e JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.first_view
        |        AND e.ts <= v.first_view + INTERVAL 24 HOUR
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id AS user_id, min(e.ts) AS first_purchase
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        |        AND e.ts <= c.first_click + INTERVAL 24 HOUR
        |      GROUP BY e.user_id)
        |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        |       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_24h,
        |       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_24h,
        |       round(CAST((SELECT count(*) FROM c) AS DOUBLE)
        |             / (SELECT count(*) FROM v), 4) AS view_to_click,
        |       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |             / greatest((SELECT count(*) FROM c), 1), 4)
        |         AS click_to_purchase""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val dayUs = 24L * 3600 * 1000000
      // v feeds the click join AND the view count; c feeds the
      // purchase join AND the click count — materialize each per-user
      // frame once (review find, r7)
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("first_view"))
        .localCheckpoint()
      val c = ev.where(col("event_type") === "click")
        .join(v.select(col("user_id").as("vu"), col("first_view")),
          col("user_id") === col("vu")
            && col("ts") > col("first_view")
            && unix_micros(col("ts")) <= unix_micros(col("first_view")) + dayUs)
        .groupBy("user_id").agg(min("ts").as("first_click"))
        .localCheckpoint()
      val p = ev.where(col("event_type") === "purchase")
        .join(c.select(col("user_id").as("cu"), col("first_click")),
          col("user_id") === col("cu")
            && col("ts") > col("first_click")
            && unix_micros(col("ts")) <= unix_micros(col("first_click")) + dayUs)
        .groupBy("user_id").agg(min("ts").as("first_purchase"))
      val nv = v.agg(count(lit(1)).as("n_view"))
      val nc = c.agg(count(lit(1)).as("n_click_24h"))
      val np = p.agg(count(lit(1)).as("n_purchase_24h"))
      nv.crossJoin(broadcast(nc)).crossJoin(broadcast(np))
        .select(col("n_view"), col("n_click_24h"), col("n_purchase_24h"),
          round(col("n_click_24h").cast("double") / col("n_view"), 4)
            .as("view_to_click"),
          round(col("n_purchase_24h").cast("double")
            / greatest(col("n_click_24h"), lit(1L)), 4).as("click_to_purchase"))
    },

    // ---- fixed-width value histogram per event type ----
    sql(
      "q_histogram",
      """SELECT event_type, CAST(floor(value / 50) AS INT) AS bucket,
        |       count(*) AS n,
        |       round(min(value), 2) AS lo, round(max(value), 2) AS hi
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"), floor(col("value") / 50).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 2).as("lo"), round(max(col("value")), 2).as("hi"))
        .orderBy("event_type", "bucket")
    },

    // ---- gaps-and-islands: collapse consecutive same-type runs into
    //      validity intervals (the SCD2 / run-length primitive) ----
    // Scale design: a change flag (lag ≠ current) and its running sum
    // share ONE window spec (partition user_id, order ts, event_id),
    // so both evaluate in a single WindowExec after a single shuffle +
    // sort — unlike the classic rn-minus-rn formulation, whose second
    // row_number partitions by (user_id, event_type) and forces a
    // second exchange.
    sql(
      "q_runs_islands",
      """WITH e AS (SELECT user_id, event_type, ts, event_id
        |           FROM events WHERE user_id % 10 = 0),
        |c AS (SELECT user_id, event_type, ts,
        |             CASE WHEN lag(event_type) OVER
        |                    (PARTITION BY user_id ORDER BY ts, event_id)
        |                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg,
        |             event_id
        |      FROM e),
        |g AS (SELECT user_id, event_type, ts,
        |             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM c)
        |SELECT user_id, event_type,
        |       CAST(epoch_us(min(ts)) AS BIGINT) AS valid_from_us,
        |       CAST(epoch_us(max(ts)) AS BIGINT) AS valid_to_us,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, event_type, grp
        |ORDER BY user_id, valid_from_us""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .where(col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w) <=> col("event_type"), lit(0))
            .otherwise(lit(1)))
        .withColumn("grp", sum(col("chg")).over(wRun))
        .groupBy("user_id", "event_type", "grp")
        .agg(
          unix_micros(min(col("ts"))).as("valid_from_us"),
          unix_micros(max(col("ts"))).as("valid_to_us"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("event_type"),
          col("valid_from_us"), col("valid_to_us"), col("n_events"))
        .orderBy("user_id", "valid_from_us")
    },

    // ---- SCD type-2 dimension build (versioned current-flag) ----
    // The warehouse op q_runs_islands' gaps-and-islands core exists
    // to serve: fold each user's event stream into a type-2 slowly-
    // changing dimension — one row per ATTRIBUTE CHANGE carrying
    // effective_from / effective_to (= next version's start, NULL
    // while current), is_current, and a per-user version number; the
    // merge-ready shape every dimensional model loads. Change rows
    // are detected with lag() over the (ts, event_id)-total order
    // (IS DISTINCT FROM so a NULL attribute can't fake a change),
    // effective_to with lead() over the SURVIVING change rows only —
    // two hash-partitioned per-user windows, no global sort, and the
    // output is corpus-proportional in the number of CHANGES, not
    // events (the compression is the point of SCD2). Timestamps
    // surface as unix micros (the q_runs_islands parity convention —
    // NTZ vs TIMESTAMPTZ hashing differs across engines; integers
    // don't).
    sql(
      "q_scd2_build",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events WHERE user_id % 10 = 3),
        |chg AS (SELECT user_id, event_type, ts, event_id FROM o
        |        WHERE prev IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type,
        |        epoch_us(ts) AS eff_from_us,
        |        epoch_us(lead(ts) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id)) AS eff_to_us,
        |        CAST(row_number() OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
        |      FROM chg)
        |SELECT user_id, version, event_type, eff_from_us,
        |       coalesce(eff_to_us, -1) AS eff_to_us,
        |       CAST(eff_to_us IS NULL AS BOOLEAN) AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val chg = t(s, dir, "events")
        .where(col("user_id") % 10 === 3)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(!(col("prev") <=> col("event_type")))
      chg
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("eff_from_us"),
          unix_micros(lead(col("ts"), 1).over(wc)).as("eff_to_us"),
          row_number().over(wc).cast("long").as("version"))
        .select(col("user_id"), col("version"), col("event_type"),
          col("eff_from_us"),
          coalesce(col("eff_to_us"), lit(-1L)).as("eff_to_us"),
          col("eff_to_us").isNull.as("is_current"))
        .orderBy("user_id", "version")
    },

    // ---- exponential smoothing (EWMA α=0.3) per key — the canonical
    // inherently-SEQUENTIAL recurrence (s = αx + (1−α)s_prev), which no
    // window frame can express. Implemented with the secondary-sort
    // pattern: repartition on the key, sortWithinPartitions on
    // (key, ts, id), then ONE sequential pass per partition folding
    // contiguous same-key runs — mapPartitions as the documented last
    // resort, and the scale story is exact: every key's run is local
    // to one partition, the fold is O(rows), state is one double.
    // The DuckDB oracle folds the identically-ordered list with
    // list_reduce (first lambda arg = accumulator, verified), seeding
    // s_0 = x_0 on both sides.
    sql(
      "q_ewma",
      """WITH l AS (SELECT user_id,
        |                  list(value ORDER BY ts, event_id) AS xs
        |           FROM events WHERE user_id % 10 = 0
        |           GROUP BY user_id)
        |SELECT user_id,
        |       CAST(len(xs) AS BIGINT) AS n_events,
        |       round(CAST(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc) AS DOUBLE), 6) AS ewma
        |FROM l ORDER BY user_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val alpha = 0.3
      // Un-sized repartition on purpose: the per-row fold is trivial,
      // so AQE is free to coalesce the ~10%-selectivity partitions
      // (contrast the blocked-levenshtein case in NOTES, where an
      // expensive residual NEEDS the pinned width).
      t(s, dir, "events")
        .where(col("user_id") % 10 === 0)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("value"))
        .as[(Long, Long, Long, Double)]
        .repartition(col("user_id"))
        .sortWithinPartitions("user_id", "us", "event_id")
        .mapPartitions { it =>
          new Iterator[(Long, Long, Double)] {
            private var pending: Option[(Long, Long, Long, Double)] =
              if (it.hasNext) Some(it.next()) else None
            def hasNext: Boolean = pending.isDefined
            def next(): (Long, Long, Double) = {
              val (uid, _, _, v0) = pending.get
              var acc = v0
              var cnt = 1L
              pending = None
              while (pending.isEmpty && it.hasNext) {
                val r = it.next()
                if (r._1 == uid) { acc = alpha * r._4 + (1 - alpha) * acc; cnt += 1 }
                else pending = Some(r)
              }
              (uid, cnt, acc)
            }
          }
        }
        .toDF("user_id", "n_events", "ewma")
        .select(col("user_id"), col("n_events"),
          round(col("ewma"), 6).as("ewma"))
        .orderBy("user_id")
    },

    // ---- cumulative distinct users per day — the scalable rewrite of
    // the (unsupported) windowed COUNT(DISTINCT): attribute each user
    // to their FIRST-SEEN day, then prefix-sum new-user counts. The
    // corpus collapses to #users rows (first-seen agg) and #days rows
    // before any window runs, so the ordered window spans ~30 rows,
    // not the event log.
    sql(
      "q_cumulative_distinct",
      """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        |           FROM events),
        |fs AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id),
        |nu AS (SELECT first_day AS day, count(*) AS new_users
        |       FROM fs GROUP BY first_day),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM d GROUP BY day)
        |SELECT dau.day AS day, dau.dau,
        |       coalesce(nu.new_users, 0) AS new_users,
        |       CAST(sum(coalesce(nu.new_users, 0))
        |              OVER (ORDER BY dau.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |         AS cum_users
        |FROM dau LEFT JOIN nu ON dau.day = nu.day
        |ORDER BY dau.day""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val fs = d.groupBy("user_id").agg(min(col("day")).as("first_day"))
      val nu = fs.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val dau = d.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val wCum = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(nu, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum(col("new_users")).over(wCum))
        .select(col("day"), col("dau"), col("new_users"), col("cum_users"))
        .orderBy("day")
    },

    // ---- time-weighted average price (TWAP) per type per day ----
    // The monitoring/finance mean for IRREGULARLY-sampled series: each
    // observation holds until the next one, so its weight is the µs
    // gap to the next event (day-end-capped for the last observation).
    // A plain avg() over-weights bursts; TWAP is the number an SLO or
    // a pricing engine actually reads. Weights are exact INTEGER
    // micros from one lead() window per (type, day) — the per-key
    // ordered-window family partitioning; Σ v·w accumulates per-row
    // doubles in DECIMAL (order-proof). The simple mean rides for the
    // burst-bias contrast.
    sql(
      "q_twap",
      """WITH e AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |        epoch_us(ts) AS tu, value,
        |        epoch_us(CAST(date_trunc('day', ts) AS DATE) + INTERVAL 1 DAY)
        |          AS day_end
        |      FROM events),
        |g AS (SELECT event_type, day, value,
        |        coalesce(lead(tu) OVER (PARTITION BY event_type, day
        |          ORDER BY tu, value), day_end) - tu AS w
        |      FROM e),
        |a AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_events,
        |        CAST(sum(w) AS BIGINT) AS total_us,
        |        sum(CAST(value * w AS DECIMAL(38,6))) AS vw,
        |        sum(CAST(value AS DECIMAL(18,6))) AS sv
        |      FROM g GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |       round(CAST(vw AS DOUBLE) / total_us, 6) AS twap,
        |       round(CAST(sv AS DOUBLE) / n_events, 6) AS simple_avg
        |FROM a ORDER BY event_type, day""".stripMargin) { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("tu"), col("value"),
          unix_micros(date_add(to_date(col("ts")), 1).cast("timestamp"))
            .as("day_end"))
      // tie rule (tu, value): ts collisions exist in the synthetic
      // log; value breaks them identically in both engines (event_id
      // is not carried to keep the projection narrow — the weight
      // assignment is order-dependent only WITHIN a tie, and any
      // consistent order yields the same Σ v·w when values tie too;
      // ordering by value makes the lead() deterministic regardless)
      val w = Window.partitionBy("event_type", "day").orderBy("tu", "value")
      val g = e.select(col("event_type"), col("day"), col("value"),
        (coalesce(lead("tu", 1).over(w), col("day_end")) - col("tu")).as("w"))
      g.groupBy("event_type", "day")
        .agg(count(lit(1)).as("n_events"),
          sum("w").cast("long").as("total_us"),
          sum((col("value") * col("w")).cast("decimal(38,6)")).as("vw"),
          sum(col("value").cast("decimal(18,6)")).as("sv"))
        .select(col("event_type"), col("day"), col("n_events"),
          round(col("vw").cast("double") / col("total_us"), 6).as("twap"),
          round(col("sv").cast("double") / col("n_events"), 6).as("simple_avg"))
        .orderBy("event_type", "day")
    },

    // ---- cohort retention matrix: users bucketed by first-seen week,
    // tracked across activity weeks. Distinct (user, week) pairs
    // collapse the log first; the cohort-size table is #cohorts rows
    // and broadcasts back for the retention ratio.
    sql(
      "q_cohort_retention",
      """WITH d AS (SELECT DISTINCT user_id,
        |                  CAST(date_trunc('week', ts) AS DATE) AS wk
        |           FROM events),
        |fs AS (SELECT user_id, min(wk) AS cohort FROM d GROUP BY user_id),
        |cs AS (SELECT cohort, count(*) AS cohort_size FROM fs GROUP BY cohort),
        |act AS (SELECT d.user_id, fs.cohort, d.wk
        |        FROM d JOIN fs ON d.user_id = fs.user_id)
        |SELECT act.cohort,
        |       CAST((act.wk - act.cohort) / 7 AS BIGINT) AS age_weeks,
        |       count(*) AS n_active,
        |       round(count(*) * 1.0 / max(cs.cohort_size), 6) AS retention
        |FROM act JOIN cs ON act.cohort = cs.cohort
        |GROUP BY act.cohort, act.wk
        |ORDER BY act.cohort, age_weeks""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val fs = d.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      val cs = fs.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      d.join(fs, "user_id")
        .groupBy("cohort", "wk")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(cs), "cohort")
        .select(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long").as("age_weeks"),
          col("n_active"),
          round(col("n_active") * 1.0 / col("cohort_size"), 6).as("retention"))
        .orderBy("cohort", "age_weeks")
    },

    // ---- first-order Markov transition matrix over user journeys:
    // lag() pairs consecutive events per user (one shuffle+sort on
    // user_id — the same exchange every per-user window op shares),
    // then the transition counts and row-normalized probabilities run
    // on the #states² aggregate.
    sql(
      "q_markov_transitions",
      """WITH o AS (SELECT user_id, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                                        ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT prev, event_type AS next, count(*) AS cnt
        |      FROM o WHERE prev IS NOT NULL GROUP BY prev, next),
        |tot AS (SELECT prev, sum(cnt) AS t FROM c GROUP BY prev)
        |SELECT c.prev, c.next, c.cnt,
        |       round(c.cnt * 1.0 / tot.t, 6) AS p
        |FROM c JOIN tot ON c.prev = tot.prev
        |ORDER BY c.prev, c.next""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val o = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNotNull)
      val c = o.groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("cnt"))
      val tot = c.groupBy("prev").agg(sum(col("cnt")).as("t"))
      c.join(broadcast(tot), "prev")
        .select(col("prev"), col("next"), col("cnt"),
          round(col("cnt") * 1.0 / col("t"), 6).as("p"))
        .orderBy("prev", "next")
    },

    // ---- Markov stationary distribution (power iteration) ----
    // Where q_markov_transitions ESTIMATES the chain, this solves it:
    // π = πP by 5 unrolled power-iteration rounds from the uniform
    // vector, the long-run state occupancy a session simulator or
    // capacity planner reads off. The corpus pays exactly one pass —
    // the same per-user lag() exchange as q_markov_transitions — and
    // every iteration runs on the #states² transition frame (25 rows
    // here): a broadcast join + k-row aggregation per round, nothing
    // corpus-sized ever re-enters. Per-state mass sums accumulate as
    // DECIMAL(38,18) (k doubles summed in engine-specific order
    // otherwise); the final vector is re-normalized so dangling-state
    // mass leak cannot silently skew the output (this corpus has
    // none — the renormalization is a no-op proven by the check
    // column). Output pairs π against the empirical state share:
    // their gap is the mixing diagnostic.
    {
      def roundSql(r: Int): String = {
        val p = r - 1
        s"""pi$r AS (SELECT cm.next AS state,
           |  CAST(sum(CAST(pi.p * cm.pr AS DECIMAL(38,18))) AS DOUBLE) AS p
           |  FROM pi$p pi JOIN cm ON cm.prev = pi.state GROUP BY 1)""".stripMargin
      }
      sql(
        "q_markov_stationary",
        s"""WITH o AS (SELECT user_id, event_type,
           |             lag(event_type) OVER (PARTITION BY user_id
           |                                   ORDER BY ts, event_id) AS prev
           |           FROM events),
           |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS cnt
           |      FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
           |tot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS t FROM c GROUP BY 1),
           |cm AS (SELECT c.prev, c.next, CAST(c.cnt AS DOUBLE) / tot.t AS pr
           |       FROM c JOIN tot ON tot.prev = c.prev),
           |k AS (SELECT CAST(count(DISTINCT prev) AS BIGINT) AS k FROM cm),
           |pi0 AS (SELECT prev AS state, 1e0 / (SELECT k FROM k) AS p
           |        FROM (SELECT DISTINCT prev FROM cm)),
           |${Seq(1, 2, 3, 4, 5).map(roundSql).mkString(",\n")},
           |z AS (SELECT CAST(sum(CAST(p AS DECIMAL(38,18))) AS DOUBLE) AS z
           |      FROM pi5),
           |emp AS (SELECT event_type AS state, CAST(count(*) AS BIGINT) AS n
           |        FROM events GROUP BY 1),
           |en AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM emp)
           |SELECT pi5.state,
           |       round(pi5.p / (SELECT z FROM z), 6) AS p_stationary,
           |       round(CAST(emp.n AS DOUBLE) / (SELECT nn FROM en), 6) AS p_empirical,
           |       round((SELECT z FROM z), 6) AS mass_check
           |FROM pi5 JOIN emp ON emp.state = pi5.state
           |ORDER BY pi5.state""".stripMargin) { (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val o = t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .where(col("prev").isNotNull)
        val c = o.groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("cnt"))
        val tot = c.groupBy("prev").agg(sum(col("cnt")).cast("long").as("t"))
        // k² transition frame: every round below runs on THIS, the
        // corpus never re-enters
        val cm = c.join(tot, "prev")
          .select(col("prev"), col("next"),
            (col("cnt").cast("double") / col("t")).as("pr"))
          .localCheckpoint()
        val k = cm.select("prev").distinct().agg(count(lit(1)).as("k"))
        var pi = cm.select("prev").distinct()
          .crossJoin(broadcast(k))
          .select(col("prev").as("state"), (lit(1.0) / col("k")).as("p"))
          .localCheckpoint()
        for (_ <- 1 to 5) {
          pi = cm.join(broadcast(pi), cm("prev") === pi("state"))
            .groupBy(col("next").as("state2"))
            .agg(sum((col("p") * col("pr")).cast("decimal(38,18)"))
              .cast("double").as("p"))
            .select(col("state2").as("state"), col("p"))
            .localCheckpoint()
        }
        val z = pi.agg(sum(col("p").cast("decimal(38,18)")).cast("double").as("z"))
        val emp = t(s, dir, "events")
          .groupBy(col("event_type").as("state")).agg(count(lit(1)).as("n"))
        val en = emp.agg(sum("n").cast("long").as("nn"))
        pi.join(emp, "state").crossJoin(broadcast(z)).crossJoin(broadcast(en))
          .select(col("state"),
            round(col("p") / col("z"), 6).as("p_stationary"),
            round(col("n").cast("double") / col("nn"), 6).as("p_empirical"),
            round(col("z"), 6).as("mass_check"))
          .orderBy("state")
      }
    },

    // ---- cohort LTV curves (cumulative revenue per user by age) ----
    // The monetary twin of q_cohort_retention: for each signup cohort
    // (first-seen week, ANY event type), weekly purchase revenue and
    // the running revenue-per-cohort-user — the curve whose asymptote
    // is LTV and whose slope ranks acquisition cohorts. One corpus
    // pass assigns cohorts (per-user min), one collapses purchases to
    // (cohort, age) DECIMAL sums; the cumulative window runs on the
    // #cohorts×#ages frame partitioned by cohort. Weeks are
    // date_trunc-based to share q_cohort_retention's convention.
    sql(
      "q_cohort_ltv",
      """WITH d AS (SELECT DISTINCT user_id,
        |                  CAST(date_trunc('week', ts) AS DATE) AS wk
        |           FROM events),
        |fs AS (SELECT user_id, min(wk) AS cohort FROM d GROUP BY user_id),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
        |       FROM fs GROUP BY cohort),
        |rev AS (SELECT fs.cohort,
        |          CAST((CAST(date_trunc('week', e.ts) AS DATE) - fs.cohort) / 7
        |               AS BIGINT) AS age_weeks,
        |          CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(18,2)) AS rev
        |        FROM events e JOIN fs ON fs.user_id = e.user_id
        |        WHERE e.event_type = 'purchase'
        |        GROUP BY 1, 2),
        |c AS (SELECT rev.cohort, rev.age_weeks, rev.rev, cs.cohort_size,
        |        sum(rev.rev) OVER (PARTITION BY rev.cohort
        |                           ORDER BY rev.age_weeks) AS cum_rev
        |      FROM rev JOIN cs ON cs.cohort = rev.cohort)
        |SELECT cohort, age_weeks, cohort_size,
        |       CAST(rev AS DOUBLE) AS rev,
        |       round(CAST(cum_rev AS DOUBLE) / cohort_size, 4) AS cum_ltv
        |FROM c ORDER BY cohort, age_weeks""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        .distinct()
      val fs = d.groupBy("user_id").agg(min(col("wk")).as("cohort"))
        .localCheckpoint() // per-user cohorts: join target + sizes
      val cs = fs.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      val rev = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .join(fs, Seq("user_id"))
        .groupBy(col("cohort"),
          (datediff(date_trunc("week", col("ts")).cast("date"), col("cohort"))
            / 7).cast("long").as("age_weeks"))
        .agg(sum(col("value").cast("decimal(18,6)"))
          .cast("decimal(18,2)").as("rev"))
      val wCum = Window.partitionBy("cohort").orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
      rev.join(broadcast(cs), Seq("cohort"))
        .withColumn("cum_rev", sum("rev").over(wCum))
        .select(col("cohort"), col("age_weeks"), col("cohort_size"),
          col("rev").cast("double").as("rev"),
          round(col("cum_rev").cast("double") / col("cohort_size"), 4)
            .as("cum_ltv"))
        .orderBy("cohort", "age_weeks")
    },

    // ---- journey predictability (conditional path entropy) ----
    // How deterministic is the user journey from each state? Shannon
    // entropy of the next-event distribution per current state, plus
    // the transition-weighted conditional entropy H(next|cur) — the
    // one-number "are journeys patterned or random" readout over the
    // same #states² transition frame q_markov_transitions builds (one
    // per-user window exchange, all entropy math on the tiny matrix).
    // Terms are exact-rational −p·log2(p) doubles accumulated in
    // DECIMAL so neither engine's merge order moves the sums.
    sql(
      "q_path_entropy",
      """WITH o AS (SELECT user_id, event_type,
        |                  lag(event_type) OVER (PARTITION BY user_id
        |                                        ORDER BY ts, event_id) AS prev
        |           FROM events),
        |c AS (SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS cnt
        |      FROM o WHERE prev IS NOT NULL GROUP BY prev, next),
        |tot AS (SELECT prev, CAST(sum(cnt) AS BIGINT) AS t FROM c GROUP BY prev),
        |h AS (SELECT c.prev, tot.t,
        |        CAST(sum(CAST(-(CAST(c.cnt AS DOUBLE) / tot.t)
        |                      * log2(CAST(c.cnt AS DOUBLE) / tot.t)
        |                      AS DECIMAL(38,18))) AS DOUBLE) AS h_bits
        |      FROM c JOIN tot ON tot.prev = c.prev
        |      GROUP BY c.prev, tot.t),
        |g AS (SELECT CAST(sum(t) AS BIGINT) AS gt FROM h),
        |cond AS (SELECT CAST(sum(CAST(CAST(t AS DOUBLE) * h_bits
        |                              AS DECIMAL(38,18))) AS DOUBLE)
        |                / (SELECT gt FROM g) AS hc FROM h)
        |SELECT prev AS state, t AS n_out, round(h_bits, 6) AS h_bits,
        |       round((SELECT hc FROM cond), 6) AS h_conditional
        |FROM h ORDER BY state""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val c = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .where(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("cnt"))
      val tot = c.groupBy("prev").agg(sum(col("cnt")).as("t"))
      val p = col("cnt").cast("double") / col("t")
      val h = c.join(broadcast(tot), "prev")
        .groupBy(col("prev"), col("t"))
        .agg(sum((-p * log2(p)).cast("decimal(38,18)"))
          .cast("double").as("h_bits"))
        .localCheckpoint() // #states rows: totals + weighted sum + output
      val g = h.agg(sum("t").as("gt"))
      val cond = h.agg(sum((col("t").cast("double") * col("h_bits"))
          .cast("decimal(38,18)")).cast("double").as("num"))
        .crossJoin(broadcast(g))
        .select((col("num") / col("gt")).as("hc"))
      h.crossJoin(broadcast(cond))
        .select(col("prev").as("state"), col("t").as("n_out"),
          round(col("h_bits"), 6).as("h_bits"),
          round(col("hc"), 6).as("h_conditional"))
        .orderBy("state")
    },

    // ---- segment-wise uplift readout ----
    // Treatment-vs-control conversion uplift per day-of-week segment:
    // the heterogeneity view a flat A/B readout hides (an experiment
    // can be net-neutral while winning weekdays and losing weekends).
    // Variant = the standard md5 hash split; conversion = purchase
    // share of events; per segment: rates, uplift, and z from the
    // UNPOOLED (Welch-style) two-proportion SE √(p₁q₁/n₁ + p₀q₀/n₀)
    // — the form that stays valid when the rates genuinely differ,
    // which is the case uplift analysis exists to detect. ONE
    // conditional-sum corpus aggregation to
    // #dow×2 cells; everything else is projections of the 7-row
    // frame. DOW from day-number arithmetic (no engine dayofweek
    // convention — the q_seasonal_dow trick).
    sql(
      "q_uplift_segments",
      """WITH s AS (SELECT
        |    (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 AS dow,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |g AS (SELECT dow,
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS BIGINT) AS c1
        |  FROM s GROUP BY dow)
        |SELECT dow, n0, c0, n1, c1,
        |  round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_control,
        |  round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_treat,
        |  round(CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0, 6) AS uplift,
        |  round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
        |        / sqrt(CAST(c1 AS DOUBLE) / n1 * (1 - CAST(c1 AS DOUBLE) / n1) / n1
        |               + CAST(c0 AS DOUBLE) / n0
        |                 * (1 - CAST(c0 AS DOUBLE) / n0) / n0), 4) AS z
        |FROM g ORDER BY dow""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions.h32
      import graft.functions.TimeFunctions.dayNum
      val sc = t(s, dir, "events")
        .select(((dayNum(col("ts")) + 4) % 7).as("dow"),
          (h32(col("user_id").cast("string")) % 2).as("v"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val g = sc.groupBy("dow")
        .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("v") === 0, col("y")).otherwise(0L)).as("c0"),
          sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("v") === 1, col("y")).otherwise(0L)).as("c1"))
      val (r0, r1) = (col("c0").cast("double") / col("n0"),
        col("c1").cast("double") / col("n1"))
      g.select(col("dow"), col("n0"), col("c0"), col("n1"), col("c1"),
          round(r0, 6).as("rate_control"), round(r1, 6).as("rate_treat"),
          round(r1 - r0, 6).as("uplift"),
          round((r1 - r0)
            / sqrt(r1 * (lit(1) - r1) / col("n1")
              + r0 * (lit(1) - r0) / col("n0")), 4).as("z"))
        .orderBy("dow")
    },

    // ---- ranking evaluation: NDCG@10 per user, treating value-desc
    // order as the predicted ranking and purchase/signup events as
    // relevant. DCG needs one per-user window (rank positions); IDCG
    // comes CLOSED-FORM from the relevant-count (Σ 1/log2(i+1) up to
    // min(nrel, 10)) — no second ranking pass. Emits only users with
    // at least one relevant event (IDCG > 0).
    sql(
      "q_ndcg",
      """WITH r AS (SELECT user_id,
        |                  CASE WHEN event_type IN ('purchase', 'signup')
        |                       THEN 1 ELSE 0 END AS rel,
        |                  row_number() OVER (PARTITION BY user_id
        |                                     ORDER BY value DESC, event_id) AS rnk
        |           FROM events WHERE user_id % 10 = 0),
        |d AS (SELECT user_id,
        |             sum(CASE WHEN rnk <= 10 THEN rel / log2(rnk + 1)
        |                      ELSE 0 END) AS dcg,
        |             CAST(sum(rel) AS BIGINT) AS nrel
        |      FROM r GROUP BY user_id)
        |SELECT user_id, nrel, round(dcg, 6) AS dcg,
        |       round(dcg / list_sum(list_transform(
        |               generate_series(1, CAST(least(nrel, 10) AS INT)),
        |               i -> 1.0 / log2(i + 1))), 6) AS ndcg
        |FROM d WHERE nrel > 0
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(desc("value"), col("event_id"))
      val r = t(s, dir, "events")
        .where(col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_id"), col("value"),
          when(col("event_type").isin("purchase", "signup"), 1)
            .otherwise(0).as("rel"))
        .withColumn("rnk", row_number().over(w))
      val d = r.groupBy("user_id")
        .agg(
          sum(when(col("rnk") <= 10, col("rel") / log2(col("rnk") + 1))
            .otherwise(0.0)).as("dcg"),
          sum(col("rel")).as("nrel"))
        .where(col("nrel") > 0)
      d.select(col("user_id"), col("nrel"), round(col("dcg"), 6).as("dcg"),
          round(col("dcg") / expr(
            "aggregate(sequence(1, CAST(least(nrel, 10) AS INT)), 0.0D, " +
              "(acc, i) -> acc + 1.0 / log2(i + 1))"), 6).as("ndcg"))
        .orderBy("user_id")
    },

    // ---- last-touch conversion attribution: each purchase credits
    // the most recent preceding view/click — one IGNORE NULLS
    // last_value window over the shared per-user exchange, then a
    // #channels-row aggregate. The first-touch variant is the same
    // plan with an unbounded-following frame.
    sql(
      "q_attribution",
      """WITH o AS (SELECT user_id, event_type, value,
        |                  last_value(CASE WHEN event_type IN ('view', 'click')
        |                                  THEN event_type END IGNORE NULLS)
        |                    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                    AS touch
        |           FROM events)
        |SELECT coalesce(touch, 'none') AS touch,
        |       count(*) AS n_purchases,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM o WHERE event_type = 'purchase'
        |GROUP BY touch ORDER BY touch""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
        .withColumn("touch",
          last(when(col("event_type").isin("view", "click"), col("event_type")),
            ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n_purchases"),
          // 3 touch groups × corpus-proportional sum → decimal
          // accumulation (order-independent; see q_agg_pricing)
          round(sum(col("value").cast("decimal(18,6)")), 2)
            .cast("double").as("revenue"))
        .orderBy("touch")
    },

    // ---- linear multi-touch attribution ----
    // The fractional complement of q_attribution's last-touch: every
    // preceding touch of the converting user shares the credit equally,
    // so a purchase with nv views and nc clicks credits nv/(nv+nc) to
    // the view channel (no touches → 'none'). Same single per-user
    // window exchange — two running conditional counts instead of one
    // last_value — then ONE aggregation computes every channel's
    // credit/revenue as conditional sums (no explode). Per-row
    // fractions are exact rationals both engines compute identically;
    // the corpus-proportional sums accumulate in DECIMAL(38,18).
    sql(
      "q_attribution_linear",
      """WITH o AS (SELECT user_id, event_type, value,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT) AS nv,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT) AS nc
        |  FROM events),
        |p AS (SELECT coalesce(nv, 0) AS nv, coalesce(nc, 0) AS nc, value
        |      FROM o WHERE event_type = 'purchase'),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN nv + nc > 0 THEN
        |      CAST(CAST(nv AS DOUBLE) / (nv + nc) AS DECIMAL(38,18))
        |      ELSE CAST(0 AS DECIMAL(38,18)) END) AS DECIMAL(38,18)) AS cv,
        |    CAST(sum(CASE WHEN nv + nc > 0 THEN
        |      CAST(value * (CAST(nv AS DOUBLE) / (nv + nc)) AS DECIMAL(38,18))
        |      ELSE CAST(0 AS DECIMAL(38,18)) END) AS DECIMAL(38,18)) AS rv,
        |    CAST(sum(CASE WHEN nv + nc > 0 THEN
        |      CAST(CAST(nc AS DOUBLE) / (nv + nc) AS DECIMAL(38,18))
        |      ELSE CAST(0 AS DECIMAL(38,18)) END) AS DECIMAL(38,18)) AS cc,
        |    CAST(sum(CASE WHEN nv + nc > 0 THEN
        |      CAST(value * (CAST(nc AS DOUBLE) / (nv + nc)) AS DECIMAL(38,18))
        |      ELSE CAST(0 AS DECIMAL(38,18)) END) AS DECIMAL(38,18)) AS rc,
        |    CAST(sum(CASE WHEN nv + nc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cn,
        |    CAST(sum(CASE WHEN nv + nc = 0
        |      THEN CAST(value AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,6)) AS rn
        |  FROM p),
        |r AS (SELECT 'click' AS touch, CAST(cc AS DOUBLE) AS credit,
        |             CAST(rc AS DOUBLE) AS revenue FROM m
        |      UNION ALL SELECT 'none', CAST(cn AS DOUBLE), CAST(rn AS DOUBLE) FROM m
        |      UNION ALL SELECT 'view', CAST(cv AS DOUBLE), CAST(rv AS DOUBLE) FROM m)
        |SELECT touch, round(credit, 4) AS credit, round(revenue, 2) AS revenue
        |FROM r ORDER BY touch""".stripMargin) { (s, dir) =>
      val wPrev = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val o = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"), col("ts"),
          col("event_id"))
        .withColumn("nv", coalesce(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(wPrev),
          lit(0L)))
        .withColumn("nc", coalesce(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(wPrev),
          lit(0L)))
        .where(col("event_type") === "purchase")
      val dz = lit(0).cast("decimal(38,18)")
      val nt = col("nv") + col("nc")
      def frac(c: Column) = c.cast("double") / nt
      val m = o.agg(
        sum(when(nt > 0, frac(col("nv")).cast("decimal(38,18)"))
          .otherwise(dz)).cast("decimal(38,18)").as("cv"),
        sum(when(nt > 0, (col("value") * frac(col("nv"))).cast("decimal(38,18)"))
          .otherwise(dz)).cast("decimal(38,18)").as("rv"),
        sum(when(nt > 0, frac(col("nc")).cast("decimal(38,18)"))
          .otherwise(dz)).cast("decimal(38,18)").as("cc"),
        sum(when(nt > 0, (col("value") * frac(col("nc"))).cast("decimal(38,18)"))
          .otherwise(dz)).cast("decimal(38,18)").as("rc"),
        sum(when(nt === 0, 1L).otherwise(0L)).as("cn"),
        sum(when(nt === 0, col("value").cast("decimal(18,6)"))
          .otherwise(lit(0).cast("decimal(18,6)"))).cast("decimal(18,6)").as("rn"))
        .localCheckpoint() // 1 row, projected 3× below
      def row(name: String, cr: Column, rev: Column) =
        m.select(lit(name).as("touch"), cr.cast("double").as("credit"),
          rev.cast("double").as("revenue"))
      row("click", col("cc"), col("rc"))
        .unionByName(row("none", col("cn"), col("rn")))
        .unionByName(row("view", col("cv"), col("rv")))
        .select(col("touch"), round(col("credit"), 4).as("credit"),
          round(col("revenue"), 2).as("revenue"))
        .orderBy("touch")
    },

    // ---- rolling exact median (5-row frame) per key — the robust
    // running-statistic for noisy telemetry. Spark's exact
    // `percentile` runs as a WINDOW aggregate over the rows frame and
    // interpolates identically to DuckDB's windowed quantile_cont
    // (verified value-for-value); one per-key shuffle+sort, O(W log W)
    // per row at W=5.
    sql(
      "q_rolling_median",
      """SELECT user_id, event_id,
        |       round(CAST(quantile_cont(value, 0.5) OVER (
        |               PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
        |         AS med5
        |FROM events WHERE user_id % 20 = 0
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      t(s, dir, "events")
        .where(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)").over(w).cast("double"), 4).as("med5"))
        .orderBy("user_id", "event_id")
    },

    // ---- OHLC candles (telemetry downsampling): open/close via
    // min_by/max_by on the event time — one hash aggregation per
    // bucket, no window, no sort of the raw stream. ts is unique in
    // this data (verified at both oracle SFs), so the time key needs
    // no tiebreak; with non-unique stamps the key becomes
    // (ts, event_id) on engines that support struct keys.
    sql(
      "q_ohlc",
      """SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS h_us,
        |       round(arg_min(value, ts), 2) AS open,
        |       round(max(value), 2) AS high,
        |       round(min(value), 2) AS low,
        |       round(arg_max(value, ts), 2) AS close,
        |       count(*) AS volume
        |FROM events GROUP BY h_us ORDER BY h_us""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("h_us"))
        .agg(
          round(expr("min_by(value, ts)"), 2).as("open"),
          round(max(col("value")), 2).as("high"),
          round(min(col("value")), 2).as("low"),
          round(expr("max_by(value, ts)"), 2).as("close"),
          count(lit(1)).as("volume"))
        .orderBy("h_us")
    },

    // ---- RFM segmentation (recency / frequency / monetary): one
    // per-user aggregation collapses the log, then three quintile
    // ranks over the #users frame and a ≤125-row segment rollup. The
    // global ntile windows run on the COLLAPSED user table; at
    // billions of users each swaps for the GlobalPrefix equal-
    // frequency allocation (q_equi_bins) with the same semantics.
    sql(
      "q_rfm",
      """WITH u AS (SELECT user_id, count(*) AS f,
        |                  round(sum(value), 2) AS m, max(ts) AS last_ts
        |           FROM events GROUP BY user_id),
        |mx AS (SELECT max(ts) AS mts FROM events),
        |q AS (SELECT user_id, f, m,
        |             CAST(epoch_us((SELECT mts FROM mx)) - epoch_us(last_ts) AS BIGINT)
        |               AS rec_us
        |      FROM u),
        |s AS (SELECT CAST(ntile(5) OVER (ORDER BY rec_us, user_id) AS INT) AS r_q,
        |             CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS INT) AS f_q,
        |             CAST(ntile(5) OVER (ORDER BY m DESC, user_id) AS INT) AS m_q
        |      FROM q)
        |SELECT r_q, f_q, m_q, count(*) AS n_users
        |FROM s GROUP BY r_q, f_q, m_q
        |ORDER BY r_q, f_q, m_q""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val u = ev.groupBy("user_id")
        .agg(count(lit(1)).as("f"), round(sum(col("value")), 2).as("m"),
          max(col("ts")).as("last_ts"))
      val mx = ev.agg(max(col("ts")).as("mts"))
      val q = u.crossJoin(broadcast(mx))
        .select(col("user_id"), col("f"), col("m"),
          (unix_micros(col("mts")) - unix_micros(col("last_ts"))).as("rec_us"))
      q.select(
          ntile(5).over(Window.orderBy(col("rec_us"), col("user_id"))).as("r_q"),
          ntile(5).over(Window.orderBy(desc("f"), col("user_id"))).as("f_q"),
          ntile(5).over(Window.orderBy(desc("m"), col("user_id"))).as("m_q"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    },

    // ---- price/volume bridge (period-over-period driver decomposition) ----
    // The BI "why did revenue move" waterfall: Δrevenue between two
    // periods split into a price effect (p₁−p₀)·q₁ and a volume effect
    // p₀·(q₁−q₀) per segment — algebraically exact (the two terms
    // telescope to p₁q₁−p₀q₀), with the float residual reported as its
    // own column so the decomposition is self-auditing. ONE corpus
    // aggregation collapses both periods to (segment, period) DECIMAL
    // revenue/quantity sums via conditional sums; all bridge math runs
    // on the #segments frame. Average price is the only double.
    sql(
      "q_price_volume_bridge",
      """WITH g AS (SELECT l_returnflag AS rf,
        |    CAST(sum(CASE WHEN date_part('year', l_shipdate) = 1997
        |             THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,2)) AS r0,
        |    CAST(sum(CASE WHEN date_part('year', l_shipdate) = 1998
        |             THEN CAST(l_extendedprice AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,2)) AS r1,
        |    CAST(sum(CASE WHEN date_part('year', l_shipdate) = 1997
        |             THEN CAST(l_quantity AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,2)) AS q0,
        |    CAST(sum(CASE WHEN date_part('year', l_shipdate) = 1998
        |             THEN CAST(l_quantity AS DECIMAL(18,6))
        |             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(18,2)) AS q1
        |  FROM lineitem
        |  WHERE date_part('year', l_shipdate) IN (1997, 1998)
        |  GROUP BY 1)
        |SELECT rf, r0, r1,
        |  round(CAST(r1 AS DOUBLE) - CAST(r0 AS DOUBLE), 2) AS delta,
        |  round((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
        |         - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
        |        * CAST(q1 AS DOUBLE), 2) AS price_effect,
        |  round(CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
        |        * (CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE)), 2) AS volume_effect,
        |  round(CAST(r1 AS DOUBLE) - CAST(r0 AS DOUBLE)
        |        - (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
        |           - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) * CAST(q1 AS DOUBLE)
        |        - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
        |          * (CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE)), 6) + 0.0 AS residual
        |FROM g ORDER BY rf""".stripMargin) { (s, dir) =>
      val zero = lit(0).cast("decimal(18,6)")
      def period(y: Int, c: Column) =
        sum(when(year(col("l_shipdate")) === y, c.cast("decimal(18,6)"))
          .otherwise(zero)).cast("decimal(18,2)")
      val g = t(s, dir, "lineitem")
        .where(year(col("l_shipdate")).isin(1997, 1998))
        .groupBy(col("l_returnflag").as("rf"))
        .agg(period(1997, col("l_extendedprice")).as("r0"),
          period(1998, col("l_extendedprice")).as("r1"),
          period(1997, col("l_quantity")).as("q0"),
          period(1998, col("l_quantity")).as("q1"))
      val (r0, r1, q0, q1) = (col("r0").cast("double"), col("r1").cast("double"),
        col("q0").cast("double"), col("q1").cast("double"))
      val pe = (r1 / q1 - r0 / q0) * q1
      val ve = r0 / q0 * (q1 - q0)
      g.select(col("rf"), col("r0"), col("r1"),
          round(r1 - r0, 2).as("delta"),
          round(pe, 2).as("price_effect"),
          round(ve, 2).as("volume_effect"),
          // `+ 0.0` on BOTH engines: IEEE −0.0 + 0.0 = +0.0, so the
          // self-audit residual hashes identically whether the engine's
          // round() preserves the sign of zero (DuckDB) or not (Spark's
          // BigDecimal path) — numerically equal, now bit-equal too.
          (round(r1 - r0 - pe - ve, 6) + lit(0.0)).as("residual"))
        .orderBy("rf")
    },

    // ---- interval union / coverage (merge overlapping intervals) ----
    // Each view event opens an interval [ts, ts + value minutes); per
    // user, overlapping intervals merge into islands (sweep line: a
    // new island starts where the start exceeds the running max of
    // prior ends) and the query reports per-user covered time, island
    // count, and the overlap ratio — the utilization/dedup-of-time
    // primitive behind ad-exposure and on-call coverage analytics.
    // One per-key sort; the cummax and island prefix-sum are window
    // passes over the same partitioning; all arithmetic in exact
    // BIGINT micros.
    sql(
      "q_interval_coverage",
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s_us,
        |    epoch_us(ts) + CAST(floor(value * 60000000.0) AS BIGINT) AS e_us
        |  FROM events WHERE event_type = 'view'),
        |m AS (SELECT user_id, s_us, e_us,
        |    CASE WHEN s_us > coalesce(max(e_us) OVER (
        |           PARTITION BY user_id ORDER BY s_us, e_us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         -9223372036854775808) THEN 1 ELSE 0 END AS new_isl
        |  FROM iv),
        |isl AS (SELECT user_id, s_us, e_us,
        |    CAST(sum(new_isl) OVER (PARTITION BY user_id ORDER BY s_us, e_us
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM m),
        |per AS (SELECT user_id, island,
        |    CAST(max(e_us) - min(s_us) AS BIGINT) AS covered_us,
        |    CAST(count(*) AS BIGINT) AS n_iv,
        |    CAST(sum(e_us - s_us) AS BIGINT) AS raw_us
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(sum(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(covered_us) AS BIGINT) AS covered_us,
        |  round(CAST(sum(raw_us) AS DOUBLE) / sum(covered_us), 4) AS overlap_ratio
        |FROM per GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val iv = t(s, dir, "events")
        .where(col("event_type") === "view")
        .select(col("user_id"), unix_micros(col("ts")).as("s_us"),
          (unix_micros(col("ts"))
            + floor(col("value") * 60000000.0).cast("long")).as("e_us"))
      val wPrev = Window.partitionBy("user_id").orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.partitionBy("user_id").orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
      val isl = iv
        .withColumn("new_isl",
          when(col("s_us") > coalesce(max("e_us").over(wPrev),
            lit(Long.MinValue)), 1).otherwise(0))
        .withColumn("island", sum("new_isl").over(wCum).cast("long"))
      val per = isl.groupBy("user_id", "island")
        .agg((max("e_us") - min("s_us")).as("covered_us"),
          count(lit(1)).as("n_iv"),
          sum(col("e_us") - col("s_us")).as("raw_us"))
      per.groupBy("user_id")
        .agg(sum("n_iv").as("n_intervals"),
          count(lit(1)).as("n_islands"),
          sum("covered_us").as("covered_us"),
          round(sum("raw_us").cast("double") / sum("covered_us"), 4)
            .as("overlap_ratio"))
        .orderBy("user_id")
    },

    // ---- SCD2 point-in-time lookup (temporal fact→dim join) ----
    // The consumption side of q_scd2_build: purchases probe the
    // run-length-compressed state dimension for the version effective
    // at purchase time (eff_from ≤ ts < eff_to, open current
    // version). The join is an equi-join on the entity key with the
    // validity range as residual predicate — at 100 TB both sides
    // hash-partition on user_id, each probe scans only its key's
    // handful of versions, and the dimension stays run-length
    // compressed (never re-exploded to per-event rows).
    sql(
      "q_scd2_lookup",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |             lag(event_type) OVER
        |               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events WHERE user_id % 10 = 3),
        |chg AS (SELECT user_id, event_type, ts, event_id FROM o
        |        WHERE prev IS DISTINCT FROM event_type),
        |v AS (SELECT user_id, event_type AS state,
        |        epoch_us(ts) AS eff_from_us,
        |        epoch_us(lead(ts) OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id)) AS eff_to_us,
        |        CAST(row_number() OVER
        |          (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version
        |      FROM chg),
        |f AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |      FROM events WHERE user_id % 10 = 3 AND event_type = 'purchase')
        |SELECT f.event_id, f.user_id, f.ts_us, v.version, v.state
        |FROM f JOIN v ON v.user_id = f.user_id
        |  AND f.ts_us >= v.eff_from_us
        |  AND (v.eff_to_us IS NULL OR f.ts_us < v.eff_to_us)
        |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val base = t(s, dir, "events").where(col("user_id") % 10 === 3)
        .localCheckpoint() // feeds the dim build AND the fact probe
      val v = base
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .where(!(col("prev") <=> col("event_type")))
        .select(col("user_id"), col("event_type").as("state"),
          unix_micros(col("ts")).as("eff_from_us"),
          unix_micros(lead(col("ts"), 1).over(w)).as("eff_to_us"),
          row_number().over(w).cast("long").as("version"))
      val f = base.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      f.join(v, f("user_id") === v("user_id")
          && f("ts_us") >= v("eff_from_us")
          && (v("eff_to_us").isNull || f("ts_us") < v("eff_to_us")))
        .select(f("event_id"), f("user_id"), col("ts_us"),
          col("version"), col("state"))
        .orderBy("event_id")
    },

    // ---- CDC changelog compaction (last-writer-wins apply) ----
    // Apply an ordered insert/update/delete changelog to produce the
    // live snapshot — the merge step of every CDC ingestion pipeline.
    // Ops derive deterministically from the event stream (signup=I,
    // error=D, else U); per key, ONE ranked window picks the final
    // op/value, and a key is live iff its last op isn't a delete.
    // This is the compaction a 100-TB CDC table runs per batch: one
    // key-partitioned window, output proportional to KEYS, never a
    // per-op join.
    sql(
      "q_cdc_apply",
      """WITH log AS (SELECT user_id,
        |    CASE WHEN event_type = 'signup' THEN 'I'
        |         WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE user_id % 10 = 1),
        |r AS (SELECT user_id, op, value, ts_us,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts_us DESC, event_id DESC) AS rn,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_ops
        |  FROM log)
        |SELECT user_id, n_ops, op AS last_op,
        |       CAST(op <> 'D' AS BOOLEAN) AS is_live,
        |       round(value, 2) AS last_value, ts_us AS last_ts_us
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
      val log = t(s, dir, "events")
        .where(col("user_id") % 10 === 1)
        .select(col("user_id"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D")
            .otherwise("U").as("op"),
          col("value"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      val wK = Window.partitionBy("user_id")
        .orderBy(desc("ts_us"), desc("event_id"))
      val r = log
        .withColumn("rn", row_number().over(wK))
        .withColumn("n_ops",
          count(lit(1)).over(Window.partitionBy("user_id")).cast("long"))
      r.where(col("rn") === 1)
        .select(col("user_id"), col("n_ops"), col("op").as("last_op"),
          (col("op") =!= "D").as("is_live"),
          round(col("value"), 2).as("last_value"),
          col("ts_us").as("last_ts_us"))
        .orderBy("user_id")
    },

    // ---- removal-effect attribution (path-based) ----
    // The data-driven complement to q_attribution's position rules:
    // each channel's credit is its REMOVAL EFFECT — how much of the
    // conversion mass disappears if journeys can no longer touch it
    // (the empirical form of Markov removal-effect attribution;
    // journeys truncate at the first purchase, the conversion event).
    // A user "converts without c" iff they convert and channel c
    // never appears strictly before the first purchase ts. ONE
    // window+groupBy exchange on user_id collapses the corpus to
    // per-user presence flags; the four removal chains are projected
    // rows of the resulting 1-row frame (the price/volume-bridge
    // unpivot pattern) — no per-channel rescans.
    sql(
      "q_attribution_removal",
      """WITH f AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      OVER (PARTITION BY user_id) AS p_ts
        |  FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS conv,
        |    max(CASE WHEN event_type = 'click' AND ts < p_ts THEN 1 ELSE 0 END) AS h_click,
        |    max(CASE WHEN event_type = 'error' AND ts < p_ts THEN 1 ELSE 0 END) AS h_error,
        |    max(CASE WHEN event_type = 'signup' AND ts < p_ts THEN 1 ELSE 0 END) AS h_signup,
        |    max(CASE WHEN event_type = 'view' AND ts < p_ts THEN 1 ELSE 0 END) AS h_view
        |  FROM f GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(conv) AS BIGINT) AS conv_total,
        |    CAST(sum(CASE WHEN conv = 1 AND h_click = 0 THEN 1 ELSE 0 END) AS BIGINT) AS wo_click,
        |    CAST(sum(CASE WHEN conv = 1 AND h_error = 0 THEN 1 ELSE 0 END) AS BIGINT) AS wo_error,
        |    CAST(sum(CASE WHEN conv = 1 AND h_signup = 0 THEN 1 ELSE 0 END) AS BIGINT) AS wo_signup,
        |    CAST(sum(CASE WHEN conv = 1 AND h_view = 0 THEN 1 ELSE 0 END) AS BIGINT) AS wo_view,
        |    CAST(sum(h_click) AS BIGINT) AS t_click,
        |    CAST(sum(h_error) AS BIGINT) AS t_error,
        |    CAST(sum(h_signup) AS BIGINT) AS t_signup,
        |    CAST(sum(h_view) AS BIGINT) AS t_view
        |  FROM u),
        |r AS (SELECT *,
        |    1.0 - CAST(wo_click AS DOUBLE) / conv_total AS re_click,
        |    1.0 - CAST(wo_error AS DOUBLE) / conv_total AS re_error,
        |    1.0 - CAST(wo_signup AS DOUBLE) / conv_total AS re_signup,
        |    1.0 - CAST(wo_view AS DOUBLE) / conv_total AS re_view
        |  FROM a),
        |s AS (SELECT *, re_click + re_error + re_signup + re_view AS re_sum FROM r)
        |SELECT * FROM (
        |  SELECT 'click' AS channel, t_click AS touched, conv_total,
        |    wo_click AS conv_without, round(re_click, 6) AS removal_effect,
        |    round(re_click / re_sum, 6) AS attribution_share,
        |    round(re_click / re_sum * conv_total, 2) AS attributed_conv FROM s
        |  UNION ALL SELECT 'error', t_error, conv_total, wo_error,
        |    round(re_error, 6), round(re_error / re_sum, 6),
        |    round(re_error / re_sum * conv_total, 2) FROM s
        |  UNION ALL SELECT 'signup', t_signup, conv_total, wo_signup,
        |    round(re_signup, 6), round(re_signup / re_sum, 6),
        |    round(re_signup / re_sum * conv_total, 2) FROM s
        |  UNION ALL SELECT 'view', t_view, conv_total, wo_view,
        |    round(re_view, 6), round(re_view / re_sum, 6),
        |    round(re_view / re_sum * conv_total, 2) FROM s)
        |ORDER BY channel""".stripMargin) { (s, dir) =>
      val wU = Window.partitionBy("user_id")
      val f = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("p_ts",
          min(when(col("event_type") === "purchase", col("ts"))).over(wU))
      def pres(c: String) = max(when(col("event_type") === c
        && col("ts") < col("p_ts"), 1).otherwise(0)).as("h_" + c)
      // window + groupBy share the user_id partitioning: one exchange
      val u = f.groupBy("user_id").agg(
        max(when(col("p_ts").isNotNull, 1).otherwise(0)).as("conv"),
        pres("click"), pres("error"), pres("signup"), pres("view"))
      val chans = Seq("click", "error", "signup", "view")
      val aggExprs = sum("conv").cast("long").as("conv_total") +:
        chans.flatMap(c => Seq(
          sum(when(col("conv") === 1 && col("h_" + c) === 0, 1L)
            .otherwise(0L)).as("wo_" + c),
          sum("h_" + c).cast("long").as("t_" + c)))
      val a = u.agg(count(lit(1)).as("n_users"), aggExprs: _*)
      val withRe = chans.foldLeft(a) { (d, c) =>
        d.withColumn("re_" + c,
          lit(1.0) - col("wo_" + c).cast("double") / col("conv_total"))
      }.withColumn("re_sum", col("re_click") + col("re_error")
        + col("re_signup") + col("re_view"))
        .localCheckpoint() // 1 row, projected 4× below
      chans.map { c =>
        withRe.select(lit(c).as("channel"), col("t_" + c).as("touched"),
          col("conv_total"), col("wo_" + c).as("conv_without"),
          round(col("re_" + c), 6).as("removal_effect"),
          round(col("re_" + c) / col("re_sum"), 6).as("attribution_share"),
          round(col("re_" + c) / col("re_sum") * col("conv_total"), 2)
            .as("attributed_conv"))
      }.reduce(_ unionByName _).orderBy("channel")
    },

    // ---- exact Shapley attribution over channel coalitions ----
    // The game-theoretic closer of the attribution family: journeys
    // collapse to their exact pre-conversion channel SET (a 4-bit
    // mask over click/error/signup/view), the characteristic function
    // v(S) = conversions reachable using only channels in S is the
    // subset-sum (zeta transform) of the 16-cell mask frame, and each
    // channel's Shapley value is the exact weighted marginal-
    // contribution sum Σ_S |S|!(3−|S|)!/4!·(v(S∪i)−v(S)) — factorial
    // weights hardcoded as exact 24ths. Every stage after the ONE
    // user-window corpus collapse runs on ≤16-row frames (the 16×16
    // subset join included); Shapley values sum to v(full)−v(∅) by
    // construction — the efficiency axiom as a checkable invariant.
    sql(
      "q_shapley_attribution",
      """WITH f AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      OVER (PARTITION BY user_id) AS p_ts
        |  FROM events),
        |u AS (SELECT user_id,
        |    max(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS conv,
        |    max(CASE WHEN event_type = 'click' AND ts < p_ts THEN 1 ELSE 0 END)
        |      + 2 * max(CASE WHEN event_type = 'error' AND ts < p_ts THEN 1 ELSE 0 END)
        |      + 4 * max(CASE WHEN event_type = 'signup' AND ts < p_ts THEN 1 ELSE 0 END)
        |      + 8 * max(CASE WHEN event_type = 'view' AND ts < p_ts THEN 1 ELSE 0 END)
        |      AS mask
        |  FROM f GROUP BY 1),
        |c AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv_n
        |      FROM u GROUP BY 1),
        |grid AS (SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT) AS s),
        |v AS (SELECT g.s, CAST(coalesce(sum(c.conv_n), 0) AS BIGINT) AS v
        |      FROM grid g LEFT JOIN c ON (c.mask & g.s) = c.mask
        |      GROUP BY 1),
        |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
        |         ('error', CAST(2 AS BIGINT)), ('signup', CAST(4 AS BIGINT)),
        |         ('view', CAST(8 AS BIGINT))) AS t(channel, bit)),
        |marg AS (SELECT ch.channel,
        |    CAST(sum((CASE bit_count(CAST(v0.s AS BIGINT) & 15)
        |              WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
        |              ELSE 6 END) * (v1.v - v0.v)) AS BIGINT) AS num24
        |  FROM ch JOIN v v0 ON (v0.s & ch.bit) = 0
        |  JOIN v v1 ON v1.s = v0.s + ch.bit
        |  GROUP BY 1),
        |tt AS (SELECT CAST((SELECT v FROM v WHERE s = 15) AS BIGINT) AS v_full,
        |         CAST((SELECT v FROM v WHERE s = 0) AS BIGINT) AS v_none)
        |SELECT m.channel, round(m.num24 / 24.0, 4) AS shapley_conv,
        |  round(m.num24 / 24.0
        |        / ((SELECT v_full FROM tt) - (SELECT v_none FROM tt)), 6)
        |    AS shapley_share,
        |  (SELECT v_full FROM tt) AS conv_total,
        |  (SELECT v_none FROM tt) AS conv_no_channel
        |FROM marg m ORDER BY m.channel""".stripMargin) { (s, dir) =>
      val wU = Window.partitionBy("user_id")
      val f = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("p_ts",
          min(when(col("event_type") === "purchase", col("ts"))).over(wU))
      def pres(c: String) = max(when(col("event_type") === c
        && col("ts") < col("p_ts"), 1L).otherwise(0L))
      val u = f.groupBy("user_id").agg(
        max(when(col("p_ts").isNotNull, 1L).otherwise(0L)).as("conv"),
        (pres("click") + lit(2) * pres("error") + lit(4) * pres("signup")
          + lit(8) * pres("view")).as("mask"))
      val c = u.groupBy("mask").agg(sum("conv").cast("long").as("conv_n"))
        .localCheckpoint() // ≤16 cells
      val grid = s.range(0, 16).select(col("id").as("s"))
      val v = grid.join(c, (c("mask").bitwiseAND(col("s"))) === c("mask"),
          "left")
        .groupBy("s").agg(coalesce(sum("conv_n"), lit(0L)).cast("long").as("v"))
        .localCheckpoint() // the 16-row zeta transform
      val ch = s.createDataFrame(Seq(("click", 1L), ("error", 2L),
        ("signup", 4L), ("view", 8L))).toDF("channel", "bit")
      val v0 = v.select(col("s").as("s0"), col("v").as("vv0"))
      val v1 = v.select(col("s").as("s1"), col("v").as("vv1"))
      val w24 = when(bit_count(col("s0").bitwiseAND(lit(15L))) === 0, 6L)
        .when(bit_count(col("s0").bitwiseAND(lit(15L))) === 1, 2L)
        .when(bit_count(col("s0").bitwiseAND(lit(15L))) === 2, 2L)
        .otherwise(6L)
      val marg = broadcast(ch)
        .join(v0, (col("s0").bitwiseAND(col("bit"))) === 0)
        .join(v1, col("s1") === col("s0") + col("bit"))
        .groupBy("channel")
        .agg(sum(w24 * (col("vv1") - col("vv0"))).cast("long").as("num24"))
      val tt = v.agg(
        max(when(col("s") === 15, col("v"))).as("v_full"),
        max(when(col("s") === 0, col("v"))).as("v_none"))
      marg.crossJoin(broadcast(tt))
        .select(col("channel"), round(col("num24") / 24.0, 4).as("shapley_conv"),
          round(col("num24") / 24.0 / (col("v_full") - col("v_none")), 6)
            .as("shapley_share"),
          col("v_full").as("conv_total"), col("v_none").as("conv_no_channel"))
        .orderBy("channel")
    }
  )
}
