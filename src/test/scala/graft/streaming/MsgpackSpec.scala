package graft.streaming

import java.sql.Timestamp

import graft.streaming.Schemas.FrameMessage
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Serde round-trips (SURVEY.md §5: serde property tests). */
class MsgpackSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private def roundTrip(f: FrameMessage): FrameMessage =
    FrameSerde.decodeMsgpack(FrameSerde.encodeMsgpack(f))

  test("frame message round-trips through msgpack") {
    val f = FrameMessage("vid-1", 42, Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")),
      29.97, Array[Byte](1, 2, 3, -1, 0, 127), 640, 480)
    val g = roundTrip(f)
    assert(g.video_id == f.video_id && g.frame_number == f.frame_number)
    assert(g.timestamp == f.timestamp && g.fps == f.fps)
    assert(g.frame_data.toSeq == f.frame_data.toSeq)
    assert(g.width == f.width && g.height == f.height)
  }

  test("msgpack round-trip property over payload sizes and values") {
    val genFrame = for {
      vid <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(40))
      fn <- Gen.chooseNum(0, Int.MaxValue)
      fps <- Gen.chooseNum(1.0, 120.0)
      n <- Gen.chooseNum(0, 70000) // crosses bin8/bin16/bin32 widths
      w <- Gen.chooseNum(0, 4096)
      h <- Gen.chooseNum(0, 4096)
    } yield FrameMessage(vid, fn, new Timestamp(1700000000000L), fps,
      Array.tabulate(n)(i => (i * 31 + 7).toByte), w, h)
    check(Prop.forAll(genFrame) { f =>
      val g = roundTrip(f)
      g.video_id == f.video_id && g.frame_number == f.frame_number &&
        g.fps == f.fps && java.util.Arrays.equals(g.frame_data, f.frame_data) &&
        g.width == f.width && g.height == f.height
    })
  }

  test("decoder backfills missing fps/width/height with defaults") {
    val bytes = Msgpack.encodeMap(Seq(
      "video_id" -> "v", "frame_number" -> 1,
      "timestamp" -> "2024-01-01T00:00:00Z",
      "frame_data" -> Array[Byte](9)))
    val f = FrameSerde.decodeMsgpack(bytes)
    assert(f.fps == 30.0 && f.width == 0 && f.height == 0)
  }

  test("offset-less reference timestamps decode (datetime.utcnow().isoformat())") {
    // The reference producer emits ISO timestamps with NO UTC offset
    // (producer/video_producer.py:119); both decode paths must accept them.
    val bytes = Msgpack.encodeMap(Seq(
      "video_id" -> "v", "frame_number" -> 1,
      "timestamp" -> "2024-06-05T12:34:56.789012", // no 'Z'
      "frame_data" -> Array[Byte](9)))
    val f = FrameSerde.decodeMsgpack(bytes)
    assert(f.timestamp == Timestamp.from(java.time.Instant.parse("2024-06-05T12:34:56.789012Z")))
    assert(FrameSerde.parseInstant("2024-01-01T00:00:00Z") ==
      java.time.Instant.parse("2024-01-01T00:00:00Z"))
  }

  test("strings >= 64 KiB take the str32 branch without truncation") {
    val big = "x" * 70000
    val out = Msgpack.decodeMap(Msgpack.encodeMap(Seq("s" -> big, "t" -> "small")))
    assert(out("s") == big && out("t") == "small")
  }

  test("integer width edge cases survive") {
    val m = Seq("a" -> 0L, "b" -> 127L, "c" -> 128L, "d" -> -32L, "e" -> -33L,
      "f" -> 65535L, "g" -> -65536L, "h" -> Long.MaxValue, "i" -> Long.MinValue)
    val out = Msgpack.decodeMap(Msgpack.encodeMap(m))
    m.foreach { case (k, v) => assert(out(k) == v, k) }
  }

  test("decoder coerces nil and non-Long numerics like MsgpackDecodeFrame") {
    // Parity contract between the two decode paths: nil numeric fields
    // hit the documented defaults BY RULE, and a producer packing
    // fps/dims as float/int decodes instead of throwing per message.
    val bytes = Msgpack.encodeMap(Seq(
      "video_id" -> "v", "frame_number" -> 3.0, // float-packed counter
      "timestamp" -> "2024-01-01T00:00:00Z",
      "frame_data" -> Array[Byte](9),
      "fps" -> 24L,          // int-packed fps (msgpack int tag)
      "width" -> null,       // nil → default 0, not accidental unboxing
      "height" -> 2.0))      // float-packed dim
    val f = FrameSerde.decodeMsgpack(bytes)
    assert(f.frame_number == 3 && f.fps == 24.0 && f.width == 0 && f.height == 2)
  }
}
