package graft.adapters

import java.io.File
import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The recorded-fixture activation test for the two reflective
  * runtime seams (r10 VERDICT #5): this zero-egress container can't
  * carry the onnxruntime or JavaCV jars, so the real-runtime
  * round-trips stay @ignore'd — but the seams' METHOD RESOLUTION must
  * not rot silently behind the `available = false` fast path. This
  * spec compiles a stub jar at test time whose classes carry the
  * exact FQCNs and method signatures the adapters resolve
  * reflectively (the published onnxruntime / JavaCV API shapes, cited
  * in RuntimeAdapters' Scaladoc), then drives BOTH production
  * adapters end-to-end in a child JVM with that jar prepended to the
  * classpath — the same activation path as dropping the real jar on a
  * cluster: zero engine changes, `available` flips, every
  * Class.forName/getMethod/invoke executes.
  *
  * What a failure means: either RuntimeAdapters drifted from the
  * runtime API shape (NoSuchMethod in the probe's output) or the seam
  * contract broke (the probe's require messages). Either way it fails
  * HERE, in every container, instead of on the first jar-equipped
  * cluster deploy.
  */
class StubJarSpec extends AnyFunSuite {

  // ---- stub sources: the API surface RuntimeAdapters resolves ----
  // ai.onnxruntime: OrtEnvironment.getEnvironment /
  // createSession(String); OnnxTensor.createTensor(env, FloatBuffer,
  // long[]) + close; session.getInputNames/run(Map)/; result.get(int)
  // + close; value.getValue → float[][]. The stub session validates
  // the tensor contract (capacity == ∏shape) and answers logit 2.0.
  private val onnxSources = Map(
    "ai/onnxruntime/OrtEnvironment.java" ->
      """package ai.onnxruntime;
        |public class OrtEnvironment {
        |  private static final OrtEnvironment ENV = new OrtEnvironment();
        |  public static OrtEnvironment getEnvironment() { return ENV; }
        |  public StubSession createSession(String path) {
        |    return new StubSession(path);
        |  }
        |}""".stripMargin,
    "ai/onnxruntime/OnnxTensor.java" ->
      """package ai.onnxruntime;
        |public class OnnxTensor {
        |  final int batch;
        |  private OnnxTensor(int b) { batch = b; }
        |  public static OnnxTensor createTensor(OrtEnvironment env,
        |      java.nio.FloatBuffer buf, long[] shape) {
        |    long cap = 1;
        |    for (long d : shape) cap *= d;
        |    if (buf.remaining() != cap)
        |      throw new IllegalArgumentException(
        |        "buffer/shape mismatch: " + buf.remaining() + " vs " + cap);
        |    return new OnnxTensor((int) shape[0]);
        |  }
        |  public void close() {}
        |}""".stripMargin,
    "ai/onnxruntime/StubSession.java" ->
      """package ai.onnxruntime;
        |public class StubSession {
        |  public StubSession(String path) {}
        |  public java.util.Set<String> getInputNames() {
        |    return java.util.Collections.singleton("input");
        |  }
        |  public StubResult run(java.util.Map inputs) {
        |    OnnxTensor t = (OnnxTensor) inputs.values().iterator().next();
        |    return new StubResult(t.batch);
        |  }
        |}""".stripMargin,
    "ai/onnxruntime/StubResult.java" ->
      """package ai.onnxruntime;
        |public class StubResult {
        |  private final int batch;
        |  StubResult(int b) { batch = b; }
        |  public StubValue get(int i) { return new StubValue(batch); }
        |  public void close() {}
        |}""".stripMargin,
    "ai/onnxruntime/StubValue.java" ->
      """package ai.onnxruntime;
        |public class StubValue {
        |  private final int batch;
        |  StubValue(int b) { batch = b; }
        |  public Object getValue() {
        |    float[][] out = new float[batch][1];
        |    for (int i = 0; i < batch; i++) out[i][0] = 2.0f;
        |    return out;
        |  }
        |}""".stripMargin)

  // org.bytedeco.javacv: FFmpegFrameRecorder(File,int,int) +
  // setFrameRate/setFormat/start/record(Frame)/stop/release;
  // Java2DFrameConverter() + convert(BufferedImage). The stub recorder
  // writes a minimal ftyp+moov container on stop, so the engine's own
  // box-walk verify exercises the finalize contract.
  private val javacvSources = Map(
    "org/bytedeco/javacv/Frame.java" ->
      """package org.bytedeco.javacv;
        |public class Frame { public int imageWidth, imageHeight; }""".stripMargin,
    "org/bytedeco/javacv/Java2DFrameConverter.java" ->
      """package org.bytedeco.javacv;
        |public class Java2DFrameConverter {
        |  public Java2DFrameConverter() {}
        |  public Frame convert(java.awt.image.BufferedImage img) {
        |    Frame f = new Frame();
        |    f.imageWidth = img.getWidth();
        |    f.imageHeight = img.getHeight();
        |    return f;
        |  }
        |}""".stripMargin,
    "org/bytedeco/javacv/FFmpegFrameRecorder.java" ->
      """package org.bytedeco.javacv;
        |public class FFmpegFrameRecorder {
        |  private final java.io.File file;
        |  private boolean started;
        |  private int frames;
        |  public FFmpegFrameRecorder(java.io.File f, int w, int h) {
        |    file = f;
        |  }
        |  public void setFrameRate(double fps) {}
        |  public void setFormat(String fmt) {
        |    if (!"mp4".equals(fmt))
        |      throw new IllegalArgumentException("stub expects mp4: " + fmt);
        |  }
        |  public void start() { started = true; }
        |  public void record(Frame f) {
        |    if (!started) throw new IllegalStateException("record before start");
        |    frames++;
        |  }
        |  public void stop() throws java.io.IOException {
        |    java.io.DataOutputStream o = new java.io.DataOutputStream(
        |      new java.io.FileOutputStream(file));
        |    o.writeInt(16); o.writeBytes("ftypisom"); o.writeInt(0);
        |    o.writeInt(8); o.writeBytes("moov");
        |    o.close();
        |  }
        |  public void release() {}
        |}""".stripMargin)

  private def compileStubJar(tmp: Path): Path = {
    val srcDir = tmp.resolve("src")
    val clsDir = tmp.resolve("classes")
    Files.createDirectories(clsDir)
    val files = (onnxSources ++ javacvSources).map { case (rel, src) =>
      val p = srcDir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, src)
      p.toString
    }.toSeq
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac != null, "JDK compiler unavailable (JRE-only runtime?)")
    val rc = javac.run(null, null, null,
      (Seq("-d", clsDir.toString) ++ files): _*)
    assert(rc == 0, s"stub compilation failed (rc $rc)")
    val jar = tmp.resolve("stub-runtimes.jar")
    val jos = new java.util.jar.JarOutputStream(
      Files.newOutputStream(jar))
    try {
      Files.walk(clsDir).filter(Files.isRegularFile(_)).forEach { f =>
        jos.putNextEntry(new java.util.zip.ZipEntry(
          clsDir.relativize(f).toString.replace(File.separatorChar, '/')))
        jos.write(Files.readAllBytes(f))
        jos.closeEntry()
      }
    } finally jos.close()
    jar
  }

  test("reflective adapters resolve and run against the stub runtime jar") {
    // in THIS JVM the runtimes must stay absent — the stub jar must
    // never leak onto the engine's own classpath (AdaptersSpec's
    // fail-fast tests depend on absence)
    assert(!RuntimeAdapters.onnxAvailable && !RuntimeAdapters.javacvAvailable,
      "real/stub runtime unexpectedly on the test classpath")

    val tmp = Files.createTempDirectory("stubjar")
    val jar = compileStubJar(tmp)
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java")
    val cp = jar.toString + File.pathSeparator +
      System.getProperty("java.class.path")
    val pb = new ProcessBuilder(javaBin.toString, "-cp", cp,
      "graft.adapters.StubJarProbeMain", tmp.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = proc.waitFor()
    assert(rc == 0 && out.contains("PROBE OK"),
      s"stub-jar probe failed (rc $rc):\n$out")
  }
}
