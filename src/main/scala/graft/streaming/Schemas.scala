package graft.streaming

import java.sql.Timestamp

/** Typed schemas for the FireWatch-parity pipeline (SURVEY.md §1.2).
  *
  * The reference moves these records as dynamic dicts over Kafka;
  * here they are case classes with compile-time `Encoder`s, so the
  * wire schema is explicit and `convert_numpy_types`-style coercion
  * (reference streams/pipeline/serialization.py:5-20) is unnecessary.
  */
object Schemas {

  /** One video frame on the wire (reference
    * producer/video_producer.py:116-124). `frame_data` is the opaque
    * JPEG payload; `timestamp` is producer event time. */
  final case class FrameMessage(
      video_id: String,
      frame_number: Int,
      timestamp: Timestamp,
      fps: Double,
      frame_data: Array[Byte],
      width: Int,
      height: Int)

  /** One detected region (reference streams/models/yolov8.py:148-155;
    * the binary classifier synthesizes a full-frame box —
    * streams/models/fire_detect_nn.py:155-165). */
  final case class Detection(
      bbox: Seq[Int],
      confidence: Double,
      class_name: String,
      class_id: Int)

  final case class FrameMeta(width: Int, height: Int, fps: Double)

  /** Per-frame inference output (reference streams/stream.py:405-418).
    * `session_id`/`session_index`/`heatmap_computed` are additions that
    * surface the keyed-state decisions (gap session, GradCAM cadence)
    * for testing; the reference keeps them implicit in process state. */
  final case class DetectionResult(
      video_id: String,
      frame_number: Int,
      timestamp: Timestamp,
      processing_timestamp: Timestamp,
      has_fire: Boolean,
      fire_probability: Double,
      detections: Seq[Detection],
      frame_metadata: FrameMeta,
      session_id: Long,
      session_index: Long,
      inference_ran: Boolean,
      heatmap_computed: Boolean)

  /** Per-video aggregate (reference streams/stream.py:380-386). */
  final case class VideoStats(
      total_frames: Long,
      fire_count: Long,
      max_fire_probability: Double)

  final case class VideoMeta(
      fps: Double, width: Int, height: Int, frame_count: Long)

  /** Emitted when a video (session) closes — gap-based or end-of-input
    * (reference streams/stream.py:305-311). */
  final case class CompletionEvent(
      video_id: String,
      local_filepath: String,
      timestamp: Timestamp,
      stats: VideoStats,
      video_metadata: VideoMeta)

  /** Checkpointable keyed state for one in-flight video session
    * (reference's parallel per-video dicts, streams/stream.py:104-121,
    * collapsed into one struct). Holds running aggregates only — O(1)
    * per key, never buffered frames. */
  final case class VideoState(
      sessionId: Long,
      sessionIndex: Long,       // frames seen in current session
      lastFrameNumber: Int,
      maxFrameSeen: Int,
      frameCount: Long,
      fireCount: Long,
      maxFireProb: Double,
      consecutiveFire: Long,    // GradCAM cadence counter (F4)
      lastProbability: Double,  // cached prediction for skipped frames
      lastHasFire: Boolean,
      meta: VideoMeta,
      firstTimestampUs: Long,
      lastTimestampUs: Long)

  /** Union row emitted by the stateful operator (detections stream +
    * completions stream are split downstream by `kind`). */
  final case class VideoEvent(
      kind: String, // "detection" | "completion"
      detection: Option[DetectionResult],
      completion: Option[CompletionEvent])
}
