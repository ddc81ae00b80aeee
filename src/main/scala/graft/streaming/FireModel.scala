package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.streaming.Schemas.Detection
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-serving seam (reference streams/models/dispatcher.py:44-86).
  *
  * Backends implement batch prediction; the pipeline calls them from
  * a `mapPartitions`/keyed-state stage, so on a real cluster the model
  * is loaded once per executor (broadcast or lazily per partition) and
  * frames batch through a single forward pass — the "batched
  * inference" win the reference defers (docs/PERFORMANCE.md:150).
  *
  * The DenseNet/YOLO torch backends of the reference are replaced by:
  *  - [[SyntheticFireModel]]: a deterministic md5-derived scorer used
  *    in tests and oracle checks (this container has no torch/ONNX);
  *  - the trait itself as the adapter point for a real TorchScript/
  *    ONNX runtime on a cluster (same contract: frames in,
  *    probability + boxes out).
  */
object FireModel {

  final case class FramePrediction(
      hasFire: Boolean,
      fireProbability: Double,
      detections: Seq[Detection],
      modelType: String)

  trait Backend extends Serializable {
    def name: String
    /** Batch contract: one call per partition-batch of frames. */
    def predictBatch(frames: Seq[(String, Int, Int, Int)]): Seq[FramePrediction]
  }

  /** Threshold mirroring CONFIDENCE_THRESHOLD (reference config.py:30). */
  val DefaultThreshold = 0.5

  /** First 32 bits of md5("vid:frame") scaled to [0,1) — identical to
    * the SQL `('0x'||substr(md5(...),1,8))::BIGINT / 4294967296.0`,
    * so oracle checks reproduce inference outputs exactly. */
  def syntheticProbability(videoId: String, frameNumber: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$videoId:$frameNumber".getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  /** Deterministic classifier backend: synthesizes a full-frame bbox on
    * positives, like the binary classifier (reference
    * streams/models/fire_detect_nn.py:155-165). */
  final case class SyntheticFireModel(threshold: Double = DefaultThreshold) extends Backend {
    val name = "synthetic"
    def predictBatch(frames: Seq[(String, Int, Int, Int)]): Seq[FramePrediction] =
      frames.map { case (vid, frameNo, w, h) =>
        val p = syntheticProbability(vid, frameNo)
        val fire = p >= threshold
        FramePrediction(
          fire,
          if (fire) p else 0.0, // reference reports 0 when no fire (fire_detect_nn.py:169)
          if (fire) Seq(Detection(Seq(0, 0, w, h), p, "fire", 1)) else Seq.empty,
          name)
      }
  }

  private val fireWords = Seq("fire", "smoke", "flame", "burn", "wildfire")
  private val exclusions = Seq("hydrant", "truck", "extinguisher", "alarm", "station", "engine")

  /** Fire-class predicate (reference streams/models/yolov8.py:17-23) as
    * a pure Column expression — codegen'd, no UDF. */
  def isFireClass(className: Column): Column = {
    val lc = lower(className)
    val hasFire = fireWords.map(w => lc.contains(w)).reduce(_ || _)
    val excluded = exclusions.map(w => lc.contains(w)).reduce(_ || _)
    hasFire && !excluded
  }
}
