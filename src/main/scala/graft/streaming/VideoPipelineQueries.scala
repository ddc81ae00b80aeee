package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle checks for the video pipeline state machine.
  *
  * The `events` table is mapped deterministically onto frame streams
  * (user → video, 5-minute offsets → frame numbers), the REAL
  * `VideoSessionProcessor` + `SyntheticFireModel` run in batch mode,
  * and the DuckDB oracle replicates the expected output relationally
  * (gaps-and-islands for sessions and GradCAM runs, IGNORE NULLS
  * last_value for the inference-cadence reuse, md5-derived
  * probabilities). This pins the exact semantics of SURVEY.md §2.1
  * A1–A6 + F4 against an independent implementation.
  */
object VideoPipelineQueries {

  import QueryDef.sql

  /** events → distinct (video_id, frame_number, timestamp_us). */
  private def framesFrom(s: SparkSession, dir: String): Dataset[VideoSessionProcessor.FrameIn] = {
    import s.implicits._
    Tables(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("eus"))
      .withColumn("fn", expr("(eus - min(eus) OVER (PARTITION BY user_id)) div 300000000").cast("int"))
      .select(
        concat(lit("v"), col("user_id").cast("string")).as("video_id"),
        col("fn").as("frame_number"))
      .distinct()
      // timestamp_us is synthesized from the frame number so Spark and
      // the oracle agree without carrying event time through DISTINCT.
      .withColumn("timestamp_us", col("frame_number").cast("long") * 300000000L)
      .as[VideoSessionProcessor.FrameIn]
  }

  private val framesSql =
    """SELECT DISTINCT 'v' || user_id AS vid,
      |       CAST((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
      |            // 300000000 AS INT) AS fn
      |FROM events""".stripMargin

  // Cadence moduli AND the session gap come from the processor Config
  // so the oracle tracks a default change instead of silently
  // diverging from the Spark side.
  private val inferN = VideoSessionProcessor.Config().inferEveryN
  private val gradcamN = VideoSessionProcessor.Config().gradcamEveryN
  private val gapN = VideoSessionProcessor.Config().gapFrames

  /** Shared oracle prefix: sessionize, cadence, synthetic inference. */
  private val pipelineSql =
    s"""WITH f0 AS ($framesSql),
       |f1 AS (SELECT vid, fn,
       |              CASE WHEN fn - lag(fn) OVER (PARTITION BY vid ORDER BY fn) > $gapN
       |                   THEN 1 ELSE 0 END AS brk
       |       FROM f0),
       |f2 AS (SELECT vid, fn,
       |              CAST(sum(brk) OVER (PARTITION BY vid ORDER BY fn
       |                                  ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT) AS sid
       |       FROM f1),
       |f3 AS (SELECT vid, fn, sid,
       |              row_number() OVER (PARTITION BY vid, sid ORDER BY fn) - 1 AS idx
       |       FROM f2),
       |f5 AS (SELECT vid, fn, sid, idx,
       |              last_value(CASE WHEN idx % $inferN = 0 THEN fn END IGNORE NULLS)
       |                OVER (PARTITION BY vid, sid ORDER BY fn ROWS UNBOUNDED PRECEDING) AS inf_fn
       |       FROM f3),
       |f6 AS (SELECT vid, fn, sid, idx, (idx % $inferN = 0) AS inference_ran,
       |              ('0x' || substr(md5(vid || ':' || inf_fn), 1, 8))::BIGINT
       |                / 4294967296.0 AS praw
       |       FROM f5),
       |f7 AS (SELECT vid, fn, sid, idx, inference_ran,
       |              praw >= 0.5 AS has_fire,
       |              CASE WHEN praw >= 0.5 THEN praw ELSE 0.0 END AS prob
       |       FROM f6)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- per-frame detections incl. cadence + GradCAM decisions ----
    sql(
      "q_video_detections",
      s"""$pipelineSql,
         |f8 AS (SELECT *,
         |              idx - row_number() OVER (PARTITION BY vid, sid, has_fire ORDER BY fn) AS island
         |       FROM f7),
         |f9 AS (SELECT *,
         |              row_number() OVER (PARTITION BY vid, sid, has_fire, island ORDER BY fn) AS run_len
         |       FROM f8)
         |SELECT vid AS video_id, fn AS frame_number, sid AS session_id,
         |       idx AS session_index, inference_ran, has_fire,
         |       round(prob, 6) AS fire_probability,
         |       (has_fire AND (run_len - 1) % $gradcamN = 0) AS heatmap_computed
         |FROM f9
         |ORDER BY video_id, frame_number""".stripMargin) { (s, dir) =>
      import s.implicits._
      val events = VideoSessionProcessor.processBatch(framesFrom(s, dir))
      events.where(col("kind") === "detection")
        .select(
          col("detection.video_id").as("video_id"),
          col("detection.frame_number").as("frame_number"),
          col("detection.session_id").as("session_id"),
          col("detection.session_index").as("session_index"),
          col("detection.inference_ran").as("inference_ran"),
          col("detection.has_fire").as("has_fire"),
          round(col("detection.fire_probability"), 6).as("fire_probability"),
          col("detection.heatmap_computed").as("heatmap_computed"))
        .orderBy("video_id", "frame_number")
    },

    // ---- per-session completion events (stats + metadata) ----
    sql(
      "q_video_completions",
      s"""$pipelineSql
         |SELECT vid AS video_id, sid AS session_id,
         |       '/videos/' || vid || '_s' || sid || '.mp4' AS local_filepath,
         |       count(*) AS total_frames,
         |       CAST(sum(CASE WHEN has_fire THEN 1 ELSE 0 END) AS BIGINT) AS fire_count,
         |       round(max(prob), 6) AS max_fire_probability,
         |       min(fn) AS first_frame, max(fn) AS last_frame
         |FROM f7
         |GROUP BY vid, sid
         |ORDER BY video_id, session_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // Both output branches consume the same stateful run — barrier it.
      val events = VideoSessionProcessor.processBatch(framesFrom(s, dir)).cache()
      val det = events.where(col("kind") === "detection")
        .groupBy(
          col("detection.video_id").as("video_id"),
          col("detection.session_id").as("session_id"))
        .agg(
          min(col("detection.frame_number")).as("first_frame"),
          max(col("detection.frame_number")).as("last_frame"))
      val comp = events.where(col("kind") === "completion")
        .select(
          col("completion.video_id").as("cvid"),
          regexp_extract(col("completion.local_filepath"), "_s(\\d+)\\.mp4$", 1)
            .cast("bigint").as("csid"),
          col("completion.local_filepath").as("local_filepath"),
          col("completion.stats.total_frames").as("total_frames"),
          col("completion.stats.fire_count").as("fire_count"),
          round(col("completion.stats.max_fire_probability"), 6).as("max_fire_probability"))
      comp.join(det,
          comp("cvid") === det("video_id") && comp("csid") === det("session_id"))
        .select(
          col("video_id"), col("session_id"), col("local_filepath"),
          col("total_frames"), col("fire_count"), col("max_fire_probability"),
          col("first_frame"), col("last_frame"))
        .orderBy("video_id", "session_id")
    }
  )
}
