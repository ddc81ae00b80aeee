package graft.expressions

import graft.streaming.{FrameSerde, Msgpack}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge.AbstractType
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expression decoding a msgpack frame envelope (the
  * reference's binary transport, SURVEY.md §2.1 S8) straight to a
  * struct — the expression-level alternative to the typed
  * `mapPartitions` stage in FrameSerde: usable in any projection,
  * no Dataset boundary, null on malformed input (poison-pill frames
  * don't kill the stream; they surface as nulls to filter/quarantine).
  *
  * Object construction here is irreducibly branchy, so this is a
  * deliberate CodegenFallback leaf (SURVEY.md §4 names msgpack_decode
  * as the custom-expression candidate); the surrounding operators
  * still whole-stage-codegen around it.
  */
case class MsgpackDecodeFrame(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  // A wrong-typed argument (e.g. a base64 STRING column through the
  // SQL registration) must fail analysis — the catch below would
  // otherwise swallow the per-row ClassCastException and return NULL
  // for every row, indistinguishable from 100% poison-pill frames.
  override def inputTypes: Seq[AbstractType] = Seq(BinaryType)
  override def dataType: DataType = MsgpackDecodeFrame.schema
  override def nullable: Boolean = true
  override def prettyName: String = "msgpack_decode_frame"

  protected override def nullSafeEval(input: Any): Any = {
    try {
      val m = Msgpack.decodeMap(input.asInstanceOf[Array[Byte]])
      // Lenient parse: the reference emits offset-less UTC timestamps.
      val inst = FrameSerde.parseInstant(m("timestamp").asInstanceOf[String])
      val tsMicros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      InternalRow(
        UTF8String.fromString(m("video_id").asInstanceOf[String]),
        // Number coercion, like every numeric field below: a
        // float-packed frame_number must decode here exactly as it
        // does in FrameSerde.decodeMsgpack, not null the whole row
        // via the catch-all while the DataFrame path keeps the frame.
        (m("frame_number") match { case n: Number => n.intValue; case _ => 0 }),
        tsMicros,
        // numeric fields coerce any packed width (msgpack ints decode
        // to Long, a nil slot to null) — same read-side leniency as
        // FrameSerde.decodeMsgpack; nil falls to the backfill default
        (m.get("fps") match { case Some(n: Number) => n.doubleValue; case _ => 30.0 }),
        m("frame_data").asInstanceOf[Array[Byte]],
        (m.get("width") match { case Some(n: Number) => n.intValue; case _ => 0 }),
        (m.get("height") match { case Some(n: Number) => n.intValue; case _ => 0 }))
    } catch {
      case _: Exception => null // malformed envelope → null row
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MsgpackDecodeFrame =
    copy(child = newChild)
}

object MsgpackDecodeFrame {
  val schema: StructType = StructType(Seq(
    StructField("video_id", StringType),
    StructField("frame_number", IntegerType),
    StructField("timestamp", TimestampType),
    StructField("fps", DoubleType),
    StructField("frame_data", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def apply(c: Column): Column = Bridge.column(MsgpackDecodeFrame(Bridge.expression(c)))
}
