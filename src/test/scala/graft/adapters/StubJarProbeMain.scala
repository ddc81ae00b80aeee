package graft.adapters

/** Child-JVM entry point for [[StubJarSpec]]: runs with the
  * test-compiled STUB runtime jar prepended to the classpath, so the
  * reflective adapters resolve `ai.onnxruntime.*` /
  * `org.bytedeco.javacv.*` for real — every `Class.forName` /
  * `getMethod` / `invoke` in the production seam executes against the
  * stub signatures. A signature drift in RuntimeAdapters (or a stub
  * that no longer matches the published API shape) dies here with a
  * NoSuchMethodException instead of rotting silently behind the
  * `available = false` fast path this container otherwise takes.
  *
  * Runs WITHOUT a SparkSession: the seam contract (FireModel.Backend,
  * VideoSink.ContainerWriter) is plain Scala, which is exactly why the
  * jar-drop activation needs no engine change.
  */
object StubJarProbeMain {
  def main(args: Array[String]): Unit = {
    val tmp = java.nio.file.Paths.get(args(0))
    // 1. availability flips to true with the stub jar on the classpath
    require(RuntimeAdapters.onnxAvailable, "onnx stub classes not resolved")
    require(RuntimeAdapters.javacvAvailable, "javacv stub classes not resolved")

    // 2. ONNX seam: decode → resize → CHW tensor → createTensor →
    // getInputNames → run → get(0) → getValue → sigmoid, the full
    // reflective sequence of OnnxFireBackend.predictImages. The stub
    // session validates the tensor contract (buffer capacity == ∏shape)
    // and returns logit 2.0 per frame.
    val backend = new RuntimeAdapters.OnnxFireBackend("/stub/model.onnx")
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jpeg = ImageIoMedia.encodeJpeg(img)
    val preds = backend.predictImages(Seq(jpeg, jpeg, jpeg))
    require(preds.length == 3, s"batch size ${preds.length} != 3")
    val want = 1.0 / (1.0 + math.exp(-2.0)) // stub logit 2.0 → sigmoid
    preds.foreach { p =>
      require(p.hasFire && math.abs(p.fireProbability - want) < 1e-6,
        s"stub prediction off: $p (want prob $want)")
      require(p.detections.nonEmpty && p.modelType == "onnx",
        s"prediction shape: $p")
    }

    // 3. JavaCV seam: (File,int,int) ctor → setFrameRate → setFormat →
    // start → Java2DFrameConverter.convert → record ×2 → stop/release;
    // the stub recorder writes a minimal ftyp+moov container on stop,
    // which the engine's OWN box-walk probe must accept.
    val mp4 = tmp.resolve("probe.mp4")
    val w = new RuntimeAdapters.JavaCvContainerWriter(mp4, 8, 6, 30.0)
    w.append(jpeg); w.append(jpeg)
    require(w.framesWritten == 2, s"framesWritten ${w.framesWritten}")
    w.close()
    require(RuntimeAdapters.mp4Verify(mp4),
      "engine mp4Verify rejected the stub-written ftyp+moov container")
    require(w.verify(mp4), "ContainerWriter.verify seam")
    println("PROBE OK")
  }
}
