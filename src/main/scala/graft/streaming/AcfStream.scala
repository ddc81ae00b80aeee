package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Ljung–Box whiteness monitor — the streaming twin of the
  * batch `q_ljung_box` operator (the 23rd batch/stream twin): the
  * Box–Jenkins ACF to lag L = 7 plus the cumulative portmanteau Q per
  * series, from O(L) state REGARDLESS of the series length. The trick
  * is that every term of the batch query's r_k assembles from
  * one-pass accumulables:
  *
  *   C_k = Σ y_t·y_{t+k}   — a ring of the LAST 7 values crosses each
  *                           arriving value with its 7 predecessors
  *   H_k = Σ_{t≤n−k} y_t   = S_y − (sum of the last k values)
  *   T_k = Σ_{t>k}  y_t    = S_y − (sum of the FIRST k values)
  *
  * so the state is (n, S_y, first-7, last-7 ring) in exact longs plus
  * (Σy², C_1..C_7) as exact BigInt (y is micro-unit cents: y² ≈ 10²⁷
  * overflows a long — the state carries the same exactness the batch
  * side gets from DECIMAL(38,0), serialized as strings in the state
  * store). On read-out, BigInt→double conversion is correctly rounded
  * exactly like the batch CAST(DECIMAL AS DOUBLE), and the r_k / Q
  * algebra runs the batch query's expression shapes in the same order
  * — [[AcfStreamSpec]] pins the emitted numbers against the BATCH
  * QUERY'S OWN OUTPUT on the same daily series.
  *
  * Like the other sequential-recurrence twins (PageHinkley, Holt,
  * Croston), the ACF is a function of the VALUE SEQUENCE, not the
  * multiset: each micro-batch sorts by timestamp and batches must
  * arrive time-ordered for cross-batch state to compose (the spec
  * exercises one-batch and ordered multi-batch arrival). Update mode:
  * every batch re-emits the series' current 7 (acf, Q) rows — the
  * live drift read a forecast monitor polls.
  *
  * CHECKPOINT COMPATIBILITY (r12 ADVICE): the r12 exactness fix
  * changed [[AcfState]]'s schema (`sy: Long` → `syStr: String`), a
  * breaking change for any flatMapGroupsWithState checkpoint written
  * by the pre-r12 state — a durable streaming query upgrading across
  * it must discard its checkpoint and replay the source (the state is
  * reconstructible from the value sequence). New deployments are
  * unaffected; there is no in-place migration path.
  */
object AcfStream {

  val L = 7

  case class ValuePoint(ts: Timestamp, series: String, v: Long)
  case class SeriesAcf(series: String, n: Long, k: Long,
      acf: Double, lb_q: Double)
  /** Exact accumulables; big sums/products ride as decimal strings.
    * S_y is exact BigInt too (r11 ADVICE): at the micro-unit scale the
    * class doc assumes (y ≈ 3e13), a plain Long Σy approaches
    * Long.MAX within ~3e5 values and would overflow SILENTLY,
    * diverging from the batch DECIMAL(38,0) path — the whole point of
    * this state is that the stream twin keeps the batch's exactness
    * at every series length. */
  case class AcfState(n: Long, syStr: String, first: Array[Long],
      last: Array[Long], syyStr: String, ckStr: Array[String])

  private def bi(s: String): BigInt = if (s.isEmpty) BigInt(0) else BigInt(s)

  def empty: AcfState = AcfState(0L, "0", Array.empty, Array.empty,
    "0", Array.fill(L)("0"))

  /** Fold a time-ordered chunk of values into the state. */
  def fold(st: AcfState, vs: Seq[Long]): AcfState = {
    var n = st.n
    var sy = bi(st.syStr)
    var syy = bi(st.syyStr)
    val ck = st.ckStr.map(bi)
    val first = scala.collection.mutable.ArrayBuffer(st.first: _*)
    // ring of the last L values, oldest first
    val last = scala.collection.mutable.ArrayBuffer(st.last: _*)
    vs.foreach { y =>
      val by = BigInt(y)
      // cross products with the k-th predecessor: last.last is lag 1
      var k = 1
      while (k <= math.min(L, last.length)) {
        ck(k - 1) += BigInt(last(last.length - k)) * by
        k += 1
      }
      n += 1
      sy += by
      syy += by * by
      if (first.length < L) first += y
      last += y
      if (last.length > L) last.remove(0)
    }
    AcfState(n, sy.toString, first.toArray, last.toArray,
      syy.toString, ck.map(_.toString))
  }

  /** The batch query's r_k / Q algebra, expression-shape identical.
    * Defined (like the batch 7-lag frame) only once n > L. */
  def results(st: AcfState): Seq[(Long, Long, Double, Double)] = {
    val n = st.n
    val sy = bi(st.syStr)
    val syD = sy.toDouble
    val syyD = bi(st.syyStr).toDouble
    val ybar = syD / n
    val den = syyD - (syD * syD) / n
    var acc = 0.0
    (1 to L).map { k =>
      val ckD = bi(st.ckStr(k - 1)).toDouble
      val hk = (sy - BigInt(st.last.takeRight(k).sum)).toDouble
      val tk = (sy - BigInt(st.first.take(k).sum)).toDouble
      val rk = (ckD - ybar * (hk + tk) + (n - k) * (ybar * ybar)) / den
      acc += (rk * rk) / (n - k)
      (n, k.toLong, rk, n * (n + 2.0) * acc)
    }
  }

  def apply(ds: Dataset[ValuePoint]): Dataset[SeriesAcf] = {
    implicit val stateEnc = Encoders.product[AcfState]
    implicit val outEnc = Encoders.product[SeriesAcf]
    import ds.sparkSession.implicits._
    ds.groupByKey(_.series)
      .flatMapGroupsWithState[AcfState, SeriesAcf](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[AcfState]) =>
          val chunk = it.toArray.sortBy(_.ts.getTime).map(_.v)
          val st = fold(state.getOption.getOrElse(empty), chunk.toSeq)
          state.update(st)
          if (st.n > L)
            results(st).iterator.map { case (n, k, acf, q) =>
              SeriesAcf(key, n, k, acf, q)
            }
          else Iterator.empty
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Update()
}
