package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-window Count–Min sketch — the streaming twin of the
  * batch `q_countmin` operator (the 22nd batch/stream twin), and the
  * frequency-domain sketch whose open-window state is FIXED-SIZE:
  * d·w = 4·1024 counters per window, whatever the token cardinality —
  * the property DriftStream's exact histogram and RankSketchStream's
  * value-count state deliberately do NOT have. Same portable cell
  * math as the batch query: row r's cell for token t is
  * h32(md5("r:t")) mod 1024 (the salted-md5 h32 family — identical
  * in Spark SQL, DuckDB, and [[BloomDedupStream.h32Salted]]), so for
  * the same window's rows every cell, and therefore every point
  * estimate, is BIT-IDENTICAL to the batch sketch
  * ([[CountMinStreamSpec]] asserts this; arrival order cannot move a
  * counter sum). Cormode & Muthukrishnan (2005): estimates never
  * undercount, and overcount ≤ ε·n with ε = e/w at confidence
  * 1−e^−d — the no-undercount half is DETERMINISTIC and the spec
  * checks it as data, the q_countmin convention.
  *
  * Two windows' (or two shards') sketches merge by CELL-WISE ADD
  * ([[merge]]) — O(d·w) counters exchanged, never tokens — the
  * reconciliation primitive for cross-cluster frequency monitoring.
  * Probe keys are fixed at wiring time (the monitor's watchlist);
  * each closed window emits one row per probe.
  */
object CountMinStream {

  case class TokenEvent(ts: Timestamp, w: String)
  case class WindowEst(window_start: Timestamp, n_tokens: Long,
      key: String, est: Long)
  /** Dense d×w counter plane + insert count — fixed ~32 KB. */
  case class CmState(cells: Array[Long], n: Long)

  val D = 4
  val W = 1024

  /** Cell column of token `t` in row `r` — the batch query's
    * ('0x' || substr(md5(r || ':' || t), 1, 8)) % 1024, via the shared
    * salted-md5 h32 (pinned to the SQL expression in the spec). */
  def cellOf(r: Int, t: String): Int =
    (BloomDedupStream.h32Salted(r, t) % W).toInt

  def insert(cells: Array[Long], t: String): Unit = {
    var r = 0
    while (r < D) { cells(r * W + cellOf(r, t)) += 1; r += 1 }
  }

  /** Point estimate: min over the d rows (never undercounts). */
  def estimate(cells: Array[Long], t: String): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = cells(r * W + cellOf(r, t))
      if (c < m) m = c
      r += 1
    }
    m
  }

  /** Cell-wise add — the CM merge theorem (sketch of the union). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == D * W && b.length == D * W, "plane shape")
    val out = new Array[Long](D * W)
    var i = 0
    while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  def apply(ds: Dataset[TokenEvent], probes: Seq[String], windowSec: Long,
      watermarkDelay: String): Dataset[WindowEst] = {
    implicit val stateEnc = Encoders.product[CmState]
    implicit val outEnc = Encoders.product[WindowEst]
    import ds.sparkSession.implicits._
    val probeList = probes.toVector
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(e => e.ts.getTime / 1000 / windowSec * windowSec)
      .flatMapGroupsWithState[CmState, WindowEst](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstartSec, it, state: GroupState[CmState]) =>
          val endMs = (wstartSec + windowSec) * 1000
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            val ws = new Timestamp(wstartSec * 1000)
            probeList.iterator.map(k =>
              WindowEst(ws, s.n, k, estimate(s.cells, k)))
          } else if (endMs <= state.getCurrentWatermarkMs()) {
            Iterator.empty // late rows never re-open a finalized window
          } else {
            val s0 = state.getOption.getOrElse(
              CmState(new Array[Long](D * W), 0L))
            val cells = s0.cells.clone()
            var n = s0.n
            it.foreach { e => insert(cells, e.w); n += 1 }
            state.update(CmState(cells, n))
            state.setTimeoutTimestamp(endMs)
            Iterator.empty
          }
      }
  }

  /** The output mode this operator requires downstream. */
  val outputMode: OutputMode = OutputMode.Append()
}
