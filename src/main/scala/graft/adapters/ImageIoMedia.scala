package graft.adapters

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import graft.llm.Multimodal
import javax.imageio.ImageIO

/** REAL image codec for the multimodal seams — not a stub: the JDK's
  * `javax.imageio` (java.desktop module, present in any server JRE)
  * decodes and encodes JPEG/PNG/BMP/GIF natively, so the decode (S9),
  * resize projection (S3), JPEG encode (S4) and heatmap overlay (F7)
  * stages of the reference pipeline (streams/pipeline/
  * video_writer.py:20-167 frame handling, streams/models/
  * gradcam.py:19-90 overlay) run for real on actual image bytes.
  * OpenCV/JavaCV remain the cluster choice for video CONTAINERS
  * (see [[JavaCvContainerWriter]]) — still images need no extra jars.
  *
  * [[ImageIoCodec]] drops into [[Multimodal.extractFeatures]]'s
  * `MediaCodec` seam unchanged (proved end-to-end in `AdaptersSpec`):
  * image payloads get their true dimensions; non-image payloads fall
  * back to the stub's deterministic pseudo-dims so a mixed corpus
  * still flows.
  */
object ImageIoMedia {

  /** Real decoder behind the [[Multimodal.MediaCodec]] seam. */
  object ImageIoCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte]): Multimodal.MediaMeta =
      decodeImage(bytes) match {
        case Some(img) => Multimodal.MediaMeta(img.getWidth, img.getHeight, "image")
        case None => Multimodal.StubCodec.decode(bytes)
      }
  }

  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** S4: real JPEG encode. */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    // JPEG has no alpha: normalize to RGB first
    val rgb =
      if (img.getType == BufferedImage.TYPE_INT_RGB) img
      else {
        val c = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
        val g = c.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose(); c
      }
    val out = new ByteArrayOutputStream()
    ImageIO.write(rgb, "jpg", out)
    out.toByteArray
  }

  /** S3: real resize projection (bilinear). */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    dst
  }

  /** F7: real heatmap overlay — the GradCAM activation grid (row-major
    * [0,1] floats) is scaled to the frame and alpha-blended as a red
    * wash, the JET-colormap analog of gradcam.py:62-90. */
  def overlayHeatmap(
      img: BufferedImage, heat: Array[Float], heatW: Int, heatH: Int,
      alpha: Float = 0.4f): BufferedImage = {
    require(heat.length == heatW * heatH, "heatmap grid size mismatch")
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    var y = 0
    while (y < out.getHeight) {
      val hy = y * heatH / out.getHeight
      var x = 0
      while (x < out.getWidth) {
        val hx = x * heatW / out.getWidth
        val a = math.min(math.max(heat(hy * heatW + hx), 0f), 1f) * alpha
        val rgb = out.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val gg = (rgb >> 8) & 0xff; val b = rgb & 0xff
        val nr = math.min(255, (r * (1 - a) + 255 * a).toInt)
        val ng = (gg * (1 - a)).toInt; val nb = (b * (1 - a)).toInt
        out.setRGB(x, y, (nr << 16) | (ng << 8) | nb)
        x += 1
      }
      y += 1
    }
    out
  }

  /** End-to-end frame transform: decode → resize → (optional overlay)
    * → JPEG re-encode, the per-frame body a real cluster pipeline runs
    * inside [[Multimodal.extractFeatures]]'s batched partition stage.
    * Non-image payloads pass through unchanged. */
  def transformFrame(
      bytes: Array[Byte], w: Int, h: Int,
      heat: Option[(Array[Float], Int, Int)] = None): Array[Byte] =
    decodeImage(bytes) match {
      case Some(img) =>
        val resized = resize(img, w, h)
        val composed = heat match {
          case Some((grid, hw, hh)) => overlayHeatmap(resized, grid, hw, hh)
          case None => resized
        }
        encodeJpeg(composed)
      case None => bytes
    }
}
