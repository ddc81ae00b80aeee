package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.adapters.{ImageIoMedia, RuntimeAdapters, WavPcm}
import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** The real-runtime adapters: the ImageIO/WAV ones run for real (the
  * JDK carries the codecs), the ONNX/JavaCV ones prove the honest
  * unavailable path here and carry ignored round-trips for a
  * jar-equipped cluster. */
class AdaptersSpec extends SparkSpec {

  import spark.implicits._

  private def testImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / h) << 8) | 0x40)
    img
  }

  test("ImageIoCodec decodes real JPEG and PNG dimensions; non-images fall back to stub") {
    val jpeg = ImageIoMedia.encodeJpeg(testImage(320, 200))
    // falsifiable form: compare DIMENSIONS only — comparing the whole
    // MediaMeta against kind "image" was vacuous (the stub's kind
    // "stub" made != hold even if it guessed the true dims)
    val stubMeta = Multimodal.StubCodec.decode(jpeg)
    assert((stubMeta.width, stubMeta.height) != (320, 200)) // stub can't know the true dims
    assert(ImageIoMedia.ImageIoCodec.decode(jpeg) == Multimodal.MediaMeta(320, 200, "image"))

    val png = { // PNG round-trips losslessly through ImageIO.write
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(testImage(17, 11), "png", out)
      out.toByteArray
    }
    assert(ImageIoMedia.ImageIoCodec.decode(png) == Multimodal.MediaMeta(17, 11, "image"))

    val text = "definitely not an image".getBytes("UTF-8")
    assert(ImageIoMedia.ImageIoCodec.decode(text) == Multimodal.StubCodec.decode(text))
  }

  test("transformFrame resizes, overlays the heatmap, and re-encodes a decodable JPEG") {
    val src = ImageIoMedia.encodeJpeg(testImage(640, 480))
    // hot top-left quadrant, cold elsewhere — a GradCAM-shaped grid
    val heat = Array.tabulate(7 * 7)(i => if (i % 7 < 3 && i / 7 < 3) 1.0f else 0.0f)
    val out = ImageIoMedia.transformFrame(src, 224, 224, Some((heat, 7, 7)))
    val img = ImageIoMedia.decodeImage(out).get
    assert(img.getWidth == 224 && img.getHeight == 224)
    // the red wash must actually land: the base image has CONSTANT
    // blue (0x40), so the hot quadrant's (1-alpha)-attenuated blue is
    // the clean overlay signal (red varies with the base gradient)
    def blue(x: Int, y: Int) = img.getRGB(x, y) & 0xff
    assert(blue(10, 10) < blue(213, 213) - 15,
      s"overlay missing: hot blue ${blue(10, 10)} vs cold blue ${blue(213, 213)}")
    // non-image payloads pass through untouched
    val junk = Array[Byte](1, 2, 3)
    assert(ImageIoMedia.transformFrame(junk, 224, 224).toSeq == junk.toSeq)
  }

  test("ImageIoCodec drops into the batched mapPartitions decode stage unchanged") {
    val payloads = Seq(
      (1L, ImageIoMedia.encodeJpeg(testImage(100, 50))),
      (2L, ImageIoMedia.encodeJpeg(testImage(64, 64))),
      (3L, "plain text payload".getBytes("UTF-8")))
    val ds = payloads.toDF("doc_id", "payload").as[Multimodal.MediaRow]
    val out = Multimodal.extractFeatures(ds, ImageIoMedia.ImageIoCodec)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(out(1L) == ((100, 50)))
    assert(out(2L) == ((64, 64)))
    val stubMeta = Multimodal.StubCodec.decode(payloads(2)._2)
    assert(out(3L) == ((stubMeta.width, stubMeta.height)))
  }

  test("WavPcm decodes a generated 16-bit WAV back to its samples") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val samples = Array.tabulate(64)(i => (math.sin(i * 0.3) * 12000).toInt)
    val fmt = new AudioFormat(8000f, 16, 1, true, false) // 16-bit signed mono LE
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    val decoded = WavPcm.decode(bos.toByteArray)
    assert(decoded.isDefined)
    assert(decoded.get.toSeq == samples.toSeq)
    assert(WavPcm.decode("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("WavPcm refuses wider-than-16-bit PCM instead of decoding garbage") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // a parseable 24-bit WAV: per-sample bytes would be misread one
    // byte at a time by an ungated 8/16-bit reader — the gate must
    // return None, never Some(noise)
    val n = 32
    val fmt24 = new AudioFormat(8000f, 24, 1, true, false)
    val raw = new Array[Byte](n * 3)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt24, n),
      AudioFileFormat.Type.WAVE, bos)
    assert(WavPcm.decode(bos.toByteArray).isEmpty)
  }

  test("mp4Verify walks top-level boxes: ftyp+moov pass, truncation fails") {
    import java.io.{ByteArrayOutputStream => BOS, DataOutputStream}
    def box(name: String, payload: Int): Array[Byte] = {
      val b = new BOS(); val d = new DataOutputStream(b)
      d.writeInt(8 + payload); d.writeBytes(name); d.write(new Array[Byte](payload))
      b.toByteArray
    }
    def fileOf(parts: Array[Byte]*): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempFile("graft_mp4probe", ".mp4")
      java.nio.file.Files.write(p, parts.flatten.toArray)
      p
    }
    val good = fileOf(box("ftyp", 16), box("mdat", 100), box("moov", 64))
    assert(RuntimeAdapters.mp4Verify(good))
    // truncated mid-recording: moov never written
    val noMoov = fileOf(box("ftyp", 16), box("mdat", 100))
    assert(!RuntimeAdapters.mp4Verify(noMoov))
    // box size overruns the file (torn final box)
    val torn = fileOf(box("ftyp", 16), box("moov", 64).dropRight(10))
    assert(!RuntimeAdapters.mp4Verify(torn))
    assert(!RuntimeAdapters.mp4Verify(fileOf("GRFT-not-mp4".getBytes("UTF-8"))))
  }

  test("ONNX and JavaCV adapters report unavailability and fail fast with a named dependency") {
    // this container carries neither jar — the honest path is a
    // named-dependency error at the seam, never a silent stub result
    assert(!RuntimeAdapters.onnxAvailable)
    assert(!RuntimeAdapters.javacvAvailable)
    val onnxErr = intercept[UnsupportedOperationException] {
      new RuntimeAdapters.OnnxFireBackend("/models/fire.onnx")
        .predictImages(Seq(Array[Byte](1, 2, 3)))
    }
    assert(onnxErr.getMessage.contains("onnxruntime"))
    // the metadata-only Backend entry point names the seam split (a
    // pixel model wires in at the upstream decode stage) jar or no jar
    val seamErr = intercept[UnsupportedOperationException] {
      new RuntimeAdapters.OnnxFireBackend("/models/fire.onnx")
        .predictBatch(Seq(("v1", 0, 224, 224)))
    }
    assert(seamErr.getMessage.contains("predictImages"))
    val cvErr = intercept[UnsupportedOperationException] {
      new RuntimeAdapters.JavaCvContainerWriter(
        java.nio.file.Paths.get("/tmp/x.mp4"), 64, 48, 30.0)
    }
    assert(cvErr.getMessage.contains("javacv"))
    // threshold logic is runtime-independent — verify the prediction
    // shaping the ONNX adapter applies to a model output
    val be = new RuntimeAdapters.OnnxFireBackend("/models/fire.onnx", threshold = 0.5)
    assert(be.predictionFrom(0.8, 640, 480).hasFire)
    assert(be.predictionFrom(0.8, 640, 480).detections.head.bbox == Seq(0, 0, 640, 480))
    assert(!be.predictionFrom(0.2, 640, 480).hasFire)
    assert(be.predictionFrom(0.2, 640, 480).fireProbability == 0.0)
  }

  ignore("onnx round-trip on a jar-equipped cluster: session loads and scores a frame batch") {
    // ADAPTERS.md §1 has the exact spark-submit + jar coordinates.
    // with onnxruntime on the classpath: OnnxFireBackend(modelPath)
    // .predictImages over ImageIoMedia-encoded 224x224 JPEGs runs the
    // real reflective decode->CHW-tensor->session.run->sigmoid path
    // and returns calibrated probabilities with full-frame boxes
    // above threshold
  }

  ignore("javacv round-trip on a jar-equipped cluster: mp4 writes, finalizes, and ffprobes clean") {
    // ADAPTERS.md §2 has the exact spark-submit + jar coordinates.
    // with javacv-platform on the classpath: JavaCvContainerWriter
    // appended with ImageIoMedia JPEG frames produces an MP4 whose
    // moov atom ffprobe accepts; WriterPool semantics are unchanged
  }
}
