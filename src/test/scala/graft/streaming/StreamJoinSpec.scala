package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The watermarked stream-stream interval join must produce exactly
  * the rows the BATCH join over the same inputs produces — whether
  * both sides arrive in one micro-batch or interleaved across
  * several — and `dropDuplicatesWithinWatermark` must keep exactly
  * one row per key when duplicates arrive within the watermark
  * horizon (across micro-batches included).
  */
abstract class StreamJoinSpecBase extends SparkSpec with StateStoreProfile {

  import StreamJoins.{Purchase, View}

  private val WindowSec = 120L
  // join tests: a delay longer than the data span, so the split-
  // arrival scenario exercises cross-batch BUFFERING, not late-data
  // drop (v@180 arriving after the purchase watermark passed 400
  // would be legitimately discarded — a different contract, pinned
  // by the drift/burst suites)
  private val Delay = "10 minutes"
  // dedup test: a short horizon, so the duplicate in batch 2 arrives
  // ahead of the watermark and MUST still be deduplicated
  private val DedupDelay = "30 seconds"

  private def p(user: Long, sec: Long, amt: Double) =
    Purchase(user, new Timestamp(sec * 1000), amt)
  private def v(user: Long, sec: Long, page: String) =
    View(user, new Timestamp(sec * 1000), page)

  private val purchases = Seq(
    p(1, 300, 10.0), p(1, 500, 20.0), p(2, 300, 30.0), p(3, 400, 40.0))
  private val views = Seq(
    v(1, 200, "a"),  // in window of p1@300 (100 s before), not p1@500
    v(1, 290, "b"),  // in window of p1@300, not p1@500 (210 s before)
    v(1, 430, "c"),  // in window of p1@500 only
    v(1, 301, "d"),  // AFTER p1@300 — matches neither (vts > ts)
    v(2, 180, "e"),  // exactly windowSec before p2@300 — inclusive
    v(4, 300, "f"))  // user with no purchases

  private def runBatch(): Set[(Long, Long, Double, Long, String)] = {
    import spark.implicits._
    StreamJoins.purchaseViews(purchases.toDS(), views.toDS(), WindowSec, Delay)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getTimestamp(3).getTime, r.getString(4)))
      .toSet
  }

  private def runStream(pBatches: Seq[Seq[Purchase]], vBatches: Seq[Seq[View]])
      : Set[(Long, Long, Double, Long, String)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Purchase]
    val vIn = MemoryStream[View]
    val q = StreamJoins.purchaseViews(pIn.toDS(), vIn.toDS(), WindowSec, Delay)
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      pBatches.zipAll(vBatches, Seq.empty[Purchase], Seq.empty[View])
        .foreach { case (pb, vb) =>
          if (pb.nonEmpty) pIn.addData(pb)
          if (vb.nonEmpty) vIn.addData(vb)
          q.processAllAvailable()
        }
      spark.table("sj_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
          r.getTimestamp(3).getTime, r.getString(4)))
        .toSet
    } finally q.stop()
  }

  test("batch oracle has the expected interval-join semantics") {
    val got = runBatch()
    // spot-pin the semantics the data encodes: inclusive bounds, no
    // post-purchase views, per-user correlation
    assert(got.contains((1L, 300000L, 10.0, 200000L, "a")))
    assert(got.contains((1L, 300000L, 10.0, 290000L, "b")))
    assert(got.contains((1L, 500000L, 20.0, 430000L, "c")))
    assert(got.contains((2L, 300000L, 30.0, 180000L, "e"))) // boundary: ts−window
    assert(!got.exists(_._5 == "d"), "a view AFTER the purchase matched")
    assert(!got.exists(_._5 == "f"), "an unrelated user's view matched")
    assert(got.size == 4)
  }

  test("one micro-batch: stream join equals batch join") {
    assert(runStream(Seq(purchases), Seq(views)) == runBatch())
  }

  test("split arrival across micro-batches: stream join equals batch join") {
    // views arrive first, then purchases two batches later, then the
    // stragglers — the join must buffer and still emit every pair
    val got = runStream(
      Seq(Seq.empty, purchases.take(2), purchases.drop(2)),
      Seq(views.take(3), Seq.empty, views.drop(3)))
    assert(got == runBatch())
  }

  test("dropDuplicatesWithinWatermark keeps one row per key across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Purchase]
    val q = StreamJoins.dedupWithinWatermark(in.toDS(), DedupDelay)
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    try {
      // the same (user_id, ts) key re-arrives in the same batch AND in
      // the next batch, inside the watermark horizon
      in.addData(Seq(p(1, 100, 1.0), p(1, 100, 1.0), p(2, 100, 2.0)))
      q.processAllAvailable()
      in.addData(Seq(p(1, 100, 1.0), p(2, 110, 3.0)))
      q.processAllAvailable()
      val got = spark.table("sd_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
      assert(got.sorted == Seq((1L, 100000L), (2L, 100000L), (2L, 110000L)),
        s"got $got")
    } finally q.stop()
  }
}

/** Default-provider profile (HDFS-backed in-memory state store). */
class StreamJoinSpec extends StreamJoinSpecBase {
  protected def stateStoreProvider: Option[String] = None
}

/** RocksDB profile: stream-stream join buffers are the state that
  * actually gets BIG in production — re-run the whole contract under
  * the on-disk store the 100-TB deployment would use. */
class StreamJoinRocksDbSpec extends StreamJoinSpecBase {
  protected def stateStoreProvider: Option[String] = Some(RocksDbProvider)
}
