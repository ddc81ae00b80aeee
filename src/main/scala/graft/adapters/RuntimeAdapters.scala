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

  /** F2/F5 adapter: ONNX session per executor, REAL inference via
    * [[predictImages]] — decode (ImageIO), 224×224 resize, [0,1] CHW
    * float tensor, one batched `session.run`, sigmoid per frame
    * (preprocessing contract mirrors fire_detect_nn.py:93-130). The
    * entire call sequence is reflective, so this compiles with no
    * onnxruntime dependency and activates when the jar is present
    * (ignored round-trip in AdaptersSpec).
    *
    * NOTE the seam split: `FireModel.Backend.predictBatch` is the
    * state machine's METADATA-ONLY contract — `FrameIn` deliberately
    * drops the pixel payload after the upstream decode stage, exactly
    * where the reference runs its model (stream.py feeds decoded
    * frames to fire_detect_nn). A pixel model therefore wires in at
    * that upstream stage via [[predictImages]]; calling the metadata
    * entry point on a pixel model fails fast with this explanation
    * rather than fabricating predictions. */
  final class OnnxFireBackend(modelPath: String, threshold: Double = FireModel.DefaultThreshold)
      extends FireModel.Backend {
    val name = "onnx"
    private val Side = 224

    @transient private lazy val envAndSession: (AnyRef, AnyRef) = {
      if (!onnxAvailable) needs("OnnxFireBackend", "ai.onnxruntime (onnxruntime jar)")
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val env = envCls.getMethod("getEnvironment").invoke(null)
      val session = envCls.getMethod("createSession", classOf[String])
        .invoke(env, modelPath)
      (env, session)
    }

    /** Real batched inference over encoded image payloads. */
    def predictImages(payloads: Seq[Array[Byte]]): Seq[FramePrediction] = {
      val (env, session) = envAndSession
      val n = payloads.length
      val buf = java.nio.FloatBuffer.allocate(n * 3 * Side * Side)
      payloads.foreach { bytes =>
        val img = ImageIoMedia.decodeImage(bytes).getOrElse(
          throw new IllegalArgumentException("frame payload is not a decodable image"))
        val r = ImageIoMedia.resize(img, Side, Side)
        // CHW, [0,1]: channel-major planes like the reference's
        // transforms.ToTensor()
        var c = 0
        while (c < 3) {
          var y = 0
          while (y < Side) {
            var x = 0
            while (x < Side) {
              val rgb = r.getRGB(x, y)
              val v = c match {
                case 0 => (rgb >> 16) & 0xff
                case 1 => (rgb >> 8) & 0xff
                case _ => rgb & 0xff
              }
              buf.put(v / 255.0f)
              x += 1
            }
            y += 1
          }
          c += 1
        }
      }
      buf.rewind()
      val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
      val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
      val tensor = tensorCls
        .getMethod("createTensor", envCls, classOf[java.nio.FloatBuffer], classOf[Array[Long]])
        .invoke(null, env, buf, Array(n.toLong, 3L, Side.toLong, Side.toLong))
      val inputName = session.getClass.getMethod("getInputNames").invoke(session)
        .asInstanceOf[java.util.Set[String]].iterator().next()
      // The input tensor is a NATIVE (off-heap) allocation: ORT frees
      // it on close(), not via GC finalization — leaking it per batch
      // grows a long-running executor until the container is killed.
      try {
        val result = session.getClass.getMethod("run", classOf[java.util.Map[_, _]])
          .invoke(session, java.util.Collections.singletonMap(inputName, tensor))
        try {
          val value = result.getClass.getMethod("get", classOf[Int])
            .invoke(result, Int.box(0))
          val logits = value.getClass.getMethod("getValue").invoke(value)
            .asInstanceOf[Array[Array[Float]]]
          logits.toSeq.map { row =>
            val prob = 1.0 / (1.0 + math.exp(-row(0).toDouble)) // sigmoid, fire_detect_nn.py:169
            predictionFrom(prob, Side, Side)
          }
        } finally result.getClass.getMethod("close").invoke(result)
      } finally tensor.getClass.getMethod("close").invoke(tensor)
    }

    def predictBatch(frames: Seq[(String, Int, Int, Int)]): Seq[FramePrediction] =
      throw new UnsupportedOperationException(
        "OnnxFireBackend is a PIXEL model: the state machine's metadata-only " +
          "Backend contract carries no frame payload (FrameIn drops it after the " +
          "upstream decode stage). Wire predictImages(payloads) at that decode " +
          "stage — where the reference runs fire_detect_nn — and feed the state " +
          "machine its outputs.")

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

    /** The moov-atom probe the reference performs with ffprobe
      * (video_writer.py:92-117) — [[RuntimeAdapters.mp4Verify]], which
      * is a plain static so the probe itself is testable without the
      * JavaCV jar this constructor requires. */
    def verify(p: Path): Boolean = mp4Verify(p)
  }

  /** Dependency-free MP4 integrity probe: walk the top-level boxes and
    * require both `ftyp` and `moov` with sizes that tile the file
    * exactly (a truncated recording lacks moov — FFmpegFrameRecorder
    * writes it in close/stop). */
  def mp4Verify(p: Path): Boolean = {
    val raf = new java.io.RandomAccessFile(p.toFile, "r")
    try {
      val len = raf.length()
      var pos = 0L
      var sawFtyp = false
      var sawMoov = false
      while (pos + 8 <= len) {
        raf.seek(pos)
        var size: Long = raf.readInt().toLong & 0xffffffffL
        val box = new Array[Byte](4)
        raf.readFully(box)
        val name = new String(box, java.nio.charset.StandardCharsets.US_ASCII)
        if (size == 1) { size = raf.readLong() } // 64-bit largesize box
        else if (size == 0) { size = len - pos } // box runs to EOF
        if (size < 8) return false
        if (name == "ftyp") sawFtyp = true
        if (name == "moov") sawMoov = true
        pos += size
      }
      pos == len && sawFtyp && sawMoov
    } catch { case _: java.io.IOException => false } finally raf.close()
  }
}
