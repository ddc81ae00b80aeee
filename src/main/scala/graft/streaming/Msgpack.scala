package graft.streaming

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal msgpack codec (spec subset) for the frame-message wire
  * format — the reference's binary transport (~33 % smaller, ~5×
  * faster than JSON+base64: /root/reference docs/PERFORMANCE.md:111-114,
  * producer/video_producer.py:19-22). Zero dependencies; supports the
  * types the frame envelope uses: map, str, bin, int, float64, bool,
  * nil. Encoders write canonical shortest forms; the decoder accepts
  * the full integer/str/bin width range.
  */
object Msgpack {

  // ---- encode ----

  def encodeMap(m: Seq[(String, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeValue(out, m)
    out.flush()
    bos.toByteArray
  }

  private def writeValue(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0xc0)
    case b: Boolean => out.writeByte(if (b) 0xc3 else 0xc2)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case d: Double => out.writeByte(0xcb); out.writeLong(java.lang.Double.doubleToLongBits(d))
    case f: Float => writeValue(out, f.toDouble)
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) out.writeByte(0xa0 | b.length)
      else if (b.length < 256) { out.writeByte(0xd9); out.writeByte(b.length) }
      else if (b.length < 65536) { out.writeByte(0xda); out.writeShort(b.length) }
      else { out.writeByte(0xdb); out.writeInt(b.length) }
      out.write(b)
    case b: Array[Byte] =>
      if (b.length < 256) { out.writeByte(0xc4); out.writeByte(b.length) }
      else if (b.length < 65536) { out.writeByte(0xc5); out.writeShort(b.length) }
      else { out.writeByte(0xc6); out.writeInt(b.length) }
      out.write(b)
    case m: Seq[_] if m.forall(_.isInstanceOf[(_, _)]) =>
      val entries = m.asInstanceOf[Seq[(String, Any)]]
      require(entries.size < 16, "fixmap only (frame envelope is small)")
      out.writeByte(0x80 | entries.size)
      entries.foreach { case (k, x) => writeValue(out, k); writeValue(out, x) }
    case other => throw new IllegalArgumentException(s"unsupported msgpack type: ${other.getClass}")
  }

  private def writeLong(out: DataOutputStream, l: Long): Unit = {
    if (l >= 0 && l <= 0x7f) out.writeByte(l.toInt)
    else if (l < 0 && l >= -32) out.writeByte((0xe0 | (l + 32)).toInt)
    else if (l >= -128 && l <= 127) { out.writeByte(0xd0); out.writeByte(l.toInt) }
    else if (l >= -32768 && l <= 32767) { out.writeByte(0xd1); out.writeShort(l.toInt) }
    else if (l >= Int.MinValue && l <= Int.MaxValue) { out.writeByte(0xd2); out.writeInt(l.toInt) }
    else { out.writeByte(0xd3); out.writeLong(l) }
  }

  // ---- decode ----

  def decodeMap(bytes: Array[Byte]): Map[String, Any] = {
    val buf = ByteBuffer.wrap(bytes)
    readValue(buf).asInstanceOf[Map[String, Any]]
  }

  private def readValue(buf: ByteBuffer): Any = {
    val b = buf.get() & 0xff
    b match {
      case x if x <= 0x7f => x.toLong
      case x if x >= 0xe0 => (x - 256).toLong
      case x if (x & 0xf0) == 0x80 => readMap(buf, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(buf, x & 0x1f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(buf, buf.get() & 0xff)
      case 0xc5 => readBin(buf, buf.getShort() & 0xffff)
      case 0xc6 => readBin(buf, buf.getInt())
      case 0xca => buf.getFloat().toDouble
      case 0xcb => buf.getDouble()
      case 0xcc => (buf.get() & 0xff).toLong
      case 0xcd => (buf.getShort() & 0xffff).toLong
      case 0xce => buf.getInt().toLong & 0xffffffffL
      case 0xcf => buf.getLong()
      case 0xd0 => buf.get().toLong
      case 0xd1 => buf.getShort().toLong
      case 0xd2 => buf.getInt().toLong
      case 0xd3 => buf.getLong()
      case 0xd9 => readStr(buf, buf.get() & 0xff)
      case 0xda => readStr(buf, buf.getShort() & 0xffff)
      case 0xdb => readStr(buf, buf.getInt())
      case 0xde => readMap(buf, buf.getShort() & 0xffff)
      case other => throw new IllegalArgumentException(f"unsupported msgpack tag 0x$other%02x")
    }
  }

  private def readStr(buf: ByteBuffer, len: Int): String = {
    val arr = new Array[Byte](len); buf.get(arr)
    new String(arr, StandardCharsets.UTF_8)
  }

  private def readBin(buf: ByteBuffer, len: Int): Array[Byte] = {
    val arr = new Array[Byte](len); buf.get(arr); arr
  }

  private def readMap(buf: ByteBuffer, n: Int): Map[String, Any] =
    (0 until n).map { _ =>
      val k = readValue(buf).asInstanceOf[String]
      k -> readValue(buf)
    }.toMap
}
