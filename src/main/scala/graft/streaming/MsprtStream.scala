package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequential A/B monitor — the streaming twin of the batch
  * `q_msprt` operator (mixture SPRT, always-valid p-values): as the
  * event-time watermark finalizes each day, the day's per-variant
  * partials fold into CUMULATIVE moments and one decision row is
  * emitted — exactly the row the batch query computes for that day.
  * This is the op's natural habitat: an experiment dashboard that is
  * "peeked at" continuously needs the sequential statistic maintained
  * incrementally, not a nightly rescan.
  *
  * Mechanics: `flatMapGroupsWithState` keyed by the experiment id
  * (one state per experiment — the metric key gives cross-experiment
  * parallelism; per-day heavy lifting belongs in an upstream windowed
  * pre-aggregation if event volume demands it). State = open-day
  * partial moments + cumulative (n, Σx, Σx²) per variant + the
  * running max Λ. Days finalize in DAY ORDER when the watermark
  * passes their end, so the running max (and hence the always-valid
  * p) is order-correct even when several days close in one batch.
  * Late rows behind the watermark are dropped — a finalized day's
  * emitted decision can never change (the append-mode contract, and
  * the statistical contract: an always-valid p must be monotone).
  *
  * Parity: sums accumulate as BigDecimal with the batch query's
  * exact scales (value → DECIMAL(18,6) HALF_UP, squares scale 12),
  * and the Λ/p expressions mirror the batch formula term-for-term,
  * so `MsprtStreamSpec` asserts EXACT equality against the
  * registered `q_msprt` rows over the same replayed events.
  */
object MsprtStream {

  case class VEvent(ts: Timestamp, variant: Int, value: Double)

  case class DayPart(na: Long, sa: BigDecimal, ssa: BigDecimal,
      nb: Long, sb: BigDecimal, ssb: BigDecimal)

  case class MState(open: Map[Long, DayPart],
      cna: Long, csa: BigDecimal, cssa: BigDecimal,
      cnb: Long, csb: BigDecimal, cssb: BigDecimal,
      maxLambda: Double)

  case class MsprtPoint(day: Timestamp, n_a: Long, n_b: Long,
      theta: Double, lambda: Double, p_always_valid: Double,
      reject_h0: Boolean)

  private val DaySec = 86400L
  /** Mixture prior variance — pinned to the batch query's τ². */
  val Tau2 = 0.1

  private val zero = BigDecimal(0)
  private def emptyState =
    MState(Map.empty, 0L, zero, zero, 0L, zero, zero, Double.MinValue)

  /** value → DECIMAL(18,6) with Spark's cast rounding (HALF_UP). */
  private def d6(v: Double): BigDecimal =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def addEvent(p: DayPart, e: VEvent): DayPart = {
    val x = d6(e.value)
    val xx = x * x // scale 12, exact
    if (e.variant == 0) p.copy(na = p.na + 1, sa = p.sa + x, ssa = p.ssa + xx)
    else p.copy(nb = p.nb + 1, sb = p.sb + x, ssb = p.ssb + xx)
  }

  /** The batch query's decision row from cumulative moments (None
    * while either arm has n < 2 — mirrored guard). */
  def decide(daySec: Long, st: MState): (Option[MsprtPoint], Double) = {
    if (st.cna < 2 || st.cnb < 2) return (None, st.maxLambda)
    val (na, nb) = (st.cna.toDouble, st.cnb.toDouble)
    val (sa, sb) = (st.csa.toDouble, st.csb.toDouble)
    val (ssa, ssb) = (st.cssa.toDouble, st.cssb.toDouble)
    val theta = sb / nb - sa / na
    val s2 = (ssa - sa * sa / na + ssb - sb * sb / nb) / (na + nb - 2)
    val vn = s2 * (1.0 / na + 1.0 / nb)
    val lambda = math.sqrt(vn / (vn + Tau2)) *
      math.exp(theta * theta * Tau2 / (2 * vn * (vn + Tau2)))
    val mx = math.max(st.maxLambda, lambda)
    val p = math.min(1.0, 1.0 / mx)
    val pr = round6(p)
    (Some(MsprtPoint(new Timestamp(daySec * 1000), st.cna, st.cnb,
      round6(theta), round6(lambda), pr, pr <= 0.05)), mx)
  }

  /** Fold every open day whose end the watermark has passed into the
    * cumulative moments, in day order; emit one decision row each.
    * A day with zero events in one arm still folds into the
    * cumulative moments but emits NO row — mirroring the batch
    * query's per-day inner join, which drops such a day while its
    * events still reach every later day's cumulative window
    * (review find, r8). */
  private def finalizeDays(st: MState, watermarkMs: Long): (MState, Seq[MsprtPoint]) = {
    val due = st.open.keys.toSeq.filter(d => (d + DaySec) * 1000 <= watermarkMs).sorted
    due.foldLeft((st, Seq.empty[MsprtPoint])) { case ((s, out), day) =>
      val p = s.open(day)
      val merged = s.copy(open = s.open - day,
        cna = s.cna + p.na, csa = s.csa + p.sa, cssa = s.cssa + p.ssa,
        cnb = s.cnb + p.nb, csb = s.csb + p.sb, cssb = s.cssb + p.ssb)
      if (p.na == 0 || p.nb == 0) (merged, out)
      else {
        val (row, mx) = decide(day, merged)
        (merged.copy(maxLambda = mx), out ++ row)
      }
    }
  }

  val outputMode: OutputMode = OutputMode.Append()

  /** Continuous monitor over `ds`; one [[MsprtPoint]] per day, emitted
    * when the watermark finalizes it. */
  def apply(ds: Dataset[VEvent], watermarkDelay: String): Dataset[MsprtPoint] = {
    implicit val stateEnc = Encoders.product[MState]
    implicit val outEnc = Encoders.product[MsprtPoint]
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_ => 0) // one experiment; a metric key scales this out
      .flatMapGroupsWithState[MState, MsprtPoint](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, it, state: GroupState[MState]) =>
          val wm = state.getCurrentWatermarkMs()
          val st0 = state.getOption.getOrElse(emptyState)
          // fold new rows into their day partials. Late rows behind
          // the watermark never reach this function: with
          // EventTimeTimeout, FlatMapGroupsWithStateExec filters them
          // BEFORE the user code (that Spark-side filter, not code
          // here, is what makes emitted decisions immutable — the
          // late-row spec pins it)
          val st1 = it.foldLeft(st0) { (s, e) =>
            val day = e.ts.getTime / 1000 / DaySec * DaySec
            s.copy(open = s.open.updated(day,
              addEvent(s.open.getOrElse(day, DayPart(0, zero, zero, 0, zero, zero)), e)))
          }
          val (st2, rows) = finalizeDays(st1, wm)
          if (st2.open.isEmpty && st2.cna == 0 && st2.cnb == 0) state.remove()
          else {
            state.update(st2)
            // wake when the earliest open day can finalize (must be
            // strictly ahead of the current watermark — guaranteed:
            // due days were just folded)
            st2.open.keys.minOption.foreach(d =>
              state.setTimeoutTimestamp((d + DaySec) * 1000))
          }
          rows.iterator
      }
  }
}
