package graft.streaming

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window PORTABLE HyperLogLog — the streaming twin of
  * the batch `q_hll_portable` operator: the same 64 registers off the
  * same 60-bit md5 hash, carried as 64 BYTES of keyed state per open
  * window and finalized exactly once when the watermark passes window
  * end. Unlike [[DistinctStream]] (whose DataSketches encoding is
  * engine-private), every number this stream emits is recomputable by
  * ANY engine from the window's value set — the cross-cluster
  * reconciliation property of the batch op, kept under streaming.
  *
  * HLL registers are a pure function of the inserted value SET
  * (per-bucket max of per-value ρ): arrival order, batch splits, and
  * duplicate re-insertions cannot move them — so for the same
  * window's rows the streaming registers are BIT-IDENTICAL to the
  * batch computation, which is what [[HllPortableStreamSpec]]
  * asserts. Two streams' windows merge by per-bucket max — 64 bytes
  * exchanged, never key sets.
  *
  * Hash and estimate match the batch query exactly: 60-bit md5
  * prefix, bucket = h mod 64, ρ = 55 − bitlength(h ⁄ 64) (55 when the
  * remainder is 0), α₆₄ = 0.709, harmonic denominator as scaled
  * integers Σ 2^(55−M_j), small-range correction m·ln(m/zeros).
  */
object HllPortableStream {

  case class UserEvent(ts: Timestamp, userId: Long)
  case class WindowHll(window_start: Timestamp, n_events: Long,
      register_sum: Long, register_max: Long, zeros: Long,
      est_distinct: Double)
  case class HllState(regs: Array[Byte], nEvents: Long)

  val M = 64

  /** (bucket, ρ) of one value — the batch query's hash math,
    * reproduced byte-for-byte. */
  def registerOf(id: Long): (Int, Int) = {
    val d = MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes(StandardCharsets.UTF_8))
    val h = java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    val bucket = (h % M).toInt
    val rest = h >>> 6
    val rho = if (rest == 0) 55
      else 55 - java.lang.Long.toBinaryString(rest).length
    (bucket, rho)
  }

  /** The batch estimator verbatim: exact-integer harmonic denominator,
    * α₆₄ = 0.709, small-range ln correction. */
  def estimate(regs: Array[Byte]): Double = {
    val zeros = regs.count(_ == 0)
    val denomScaled = regs.map(m => 1L << (55 - m)).sum
    val raw = 0.709 * 4096 * 36028797018963968.0 / denomScaled
    if (raw <= 160 && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }

  def apply(ds: Dataset[UserEvent], windowSec: Long, watermarkDelay: String)
      : Dataset[WindowHll] = {
    implicit val stateEnc = Encoders.product[HllState]
    implicit val outEnc = Encoders.product[WindowHll]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[HllState, WindowHll](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[HllState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(WindowHll(new Timestamp(wstartSec * 1000),
              s.nEvents, s.regs.map(_.toLong).sum, s.regs.max.toLong,
              s.regs.count(_ == 0).toLong, estimate(s.regs)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            Iterator.empty // late rows never re-open a finalized window
          } else {
            val s0 = state.getOption.getOrElse(
              HllState(new Array[Byte](M), 0L))
            val regs = s0.regs.clone()
            var n = s0.nEvents
            it.foreach { e =>
              val (b, rho) = registerOf(e.userId)
              if (rho > regs(b)) regs(b) = rho.toByte
              n += 1
            }
            state.update(HllState(regs, n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
