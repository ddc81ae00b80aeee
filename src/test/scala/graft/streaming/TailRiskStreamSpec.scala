package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming tail-risk monitor must be EXACT: per finalized
  * window, VaR is the value at exact nearest-rank ⌈0.05·n⌉ ascending
  * (the batch q_expected_shortfall selection rule) and the tail sum
  * takes exactly tail_n addends — both pure functions of the window's
  * value multiset, so arrival order and micro-batch splits cannot
  * move them.
  */
class TailRiskStreamSpec extends SparkSpec {

  import TailRiskStream._

  private val WindowSec = 60L

  private def ev(sec: Long, cents: Long) =
    PnlEvent(new Timestamp(sec * 1000), cents)

  /** From-scratch expectation: full sort, the batch rank formula. */
  private def expected(vals: Seq[Long]): (Long, Long, Long, Long) = {
    val sorted = vals.sorted
    val n = vals.size.toLong
    val k = ((n + 19) / 20).toInt
    (n, k.toLong, sorted(k - 1), sorted.take(k).sum)
  }

  test("tail() equals the full-sort selection on adversarial ties") {
    val rnd = new scala.util.Random(5)
    // heavy ties exactly at the rank boundary: the crossing value's
    // count overshoots tail_n, the sum must take only k addends
    val vals = Vector.fill(400)(-100L) ++
      Vector.fill(1200)(rnd.nextInt(5000).toLong - 2500L) ++
      Vector.fill(400)(-100L)
    val hist = vals.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
    val got = tail(hist)
    assert(got == expected(vals), s"$got vs ${expected(vals)}")
  }

  private def runStream(batches: Seq[Seq[PnlEvent]],
      delay: String = "10 seconds"): Map[Long, (Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PnlEvent]
    val q = TailRiskStream(input.toDS(), WindowSec, delay)
      .writeStream.format("memory").queryName("tail_out")
      .outputMode(TailRiskStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("tail_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    } finally q.stop()
  }

  test("one-batch window equals the from-scratch selection") {
    val rnd = new scala.util.Random(17)
    val vals = Vector.fill(800)(rnd.nextInt(20000).toLong - 10000L)
    val got = runStream(Seq(vals.map(v => ev(30, v))))
    assert(got(0L) == expected(vals), s"${got(0L)} vs ${expected(vals)}")
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val rnd = new scala.util.Random(29)
    val vals = Vector.fill(900)(rnd.nextInt(9999).toLong - 5000L)
    val shuffled = rnd.shuffle(vals)
    val got = runStream(Seq(shuffled.take(200).map(v => ev(10, v)),
      shuffled.slice(200, 500).map(v => ev(20, v)),
      shuffled.drop(500).map(v => ev(40, v))), delay = "500 seconds")
    assert(got(0L) == expected(vals), s"${got(0L)} vs ${expected(vals)}")
  }

  test("distinct-value cap enforces the exact-histogram contract") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PnlEvent]
    val q = TailRiskStream(input.toDS(), WindowSec, "10 seconds",
        maxDistinct = 100)
      .writeStream.format("memory").queryName("tail_cap_out")
      .outputMode(TailRiskStream.outputMode).start()
    try {
      input.addData((1L to 101L).map(v => ev(30, v)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("distinct values > cap 100"))),
        s"cap message missing in ${chain(e).map(_.getMessage)}")
    } finally q.stop()
  }
}
