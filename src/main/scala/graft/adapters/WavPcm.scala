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
    * payloads that aren't a parseable audio container. */
  def decode(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
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
              } else (raw(off) & 0xff) - 128 // 8-bit WAV is unsigned
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
