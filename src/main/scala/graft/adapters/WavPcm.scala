package graft.adapters

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

/** REAL audio decode for the audio-features seam: `javax.sound.sampled`
  * (java.desktop module) parses WAV/AIFF containers and yields signed
  * PCM samples — the actual decoder the byte-level stand-in in
  * [[graft.llm.Multimodal.extractAudioFeatures]] models. Compressed
  * codecs (mp3/aac) still need an external lib on a cluster; WAV is
  * the interchange format a frame/audio pipeline actually moves. */
object WavPcm {

  /** Decode a WAV payload to mono-averaged 16-bit samples; None for
    * payloads that aren't a parseable audio container OR aren't
    * 8/16-bit integer PCM (24/32-bit, float, μ-law/A-law parse fine
    * via AudioSystem but would read one byte of each wider sample as
    * if it were the whole value — garbage offered as data; those
    * formats route through AudioSystem.getAudioInputStream(targetFmt)
    * transcoding on a cluster). */
  def decode(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        // canonical WAV layouts only: 16-bit signed, or 8-bit (either
        // sign convention — handled below)
        val ok = (signed && fmt.getSampleSizeInBits == 16) ||
          ((signed || unsigned) && fmt.getSampleSizeInBits == 8)
        if (!ok) return None
        val frameSize = fmt.getFrameSize
        val channels = fmt.getChannels
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val raw = in.readAllBytes()
        val n = raw.length / frameSize
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          var acc = 0
          var c = 0
          while (c < channels) {
            val off = i * frameSize + c * bytesPerSample
            val s =
              if (bytesPerSample == 2) {
                val lo = raw(off) & 0xff; val hi = raw(off + 1)
                if (fmt.isBigEndian) (raw(off) << 8) | (raw(off + 1) & 0xff)
                else (hi << 8) | lo
              } else if (unsigned) (raw(off) & 0xff) - 128 // 8-bit WAV norm
              else raw(off).toInt // 8-bit signed (AIFF convention)
            acc += s
            c += 1
          }
          out(i) = acc / channels
          i += 1
        }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }
}
