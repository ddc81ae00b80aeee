package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming KMV sketch must be BIT-IDENTICAL to the batch
  * bottom-k computation over the same window's rows — the sketch is a
  * pure function of the inserted value set, so arrival order, batch
  * splits, and duplicate re-insertions cannot move the k smallest
  * hashes. The batch expectation below reproduces q_bottomk_sample's
  * exact Spark SQL hash (conv(substring(md5(id),1,15),16,10)/2^60), so
  * this spec also pins the Scala-side hashOf to the SQL expression.
  */
class KmvStreamSpec extends SparkSpec {

  import KmvStream.UserEvent

  private val WindowSec = 60L

  private def ev(sec: Long, uid: Long) = UserEvent(new Timestamp(sec * 1000), uid)

  /** (windowStartMs -> (nEvents, kSeen, kthHash, est, idSum)) via the
    * batch SQL hash — the q_bottomk_sample expression verbatim. */
  private def expected(rows: Seq[UserEvent])
      : Map[Long, (Long, Long, Double, Double, Long)] = {
    import spark.implicits._
    val w = rows.toDS()
      .groupBy(((col("ts").cast("long") / WindowSec).cast("long")
        * WindowSec * 1000).as("w"), col("userId"))
      .agg(count(lit(1)).as("c"))
      .select(col("w"), col("userId"), col("c"),
        (conv(substring(md5(col("userId").cast("string")), 1, 15), 16, 10)
          .cast("long") / lit(1152921504606846976.0)).as("hu"))
      .collect()
    w.groupBy(_.getLong(0)).map { case (win, g) =>
      val nEvents = g.map(_.getLong(2)).sum
      val pairs = g.map(r => (r.getDouble(3), r.getLong(1)))
        .sortBy(p => (p._1, p._2)).take(KmvStream.K)
      val kth = if (pairs.isEmpty) 0.0 else pairs.last._1
      val est = if (pairs.length < KmvStream.K) pairs.length.toDouble
        else (KmvStream.K - 1) / kth
      win -> (nEvents, pairs.length.toLong, kth, est, pairs.map(_._2).sum)
    }
  }

  private def runStream(batches: Seq[Seq[UserEvent]],
      delay: String = "10 seconds")
      : Map[Long, (Long, Long, Double, Double, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = KmvStream(input.toDS(), WindowSec, delay)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode(KmvStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("kmv_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getLong(5)))
        .toMap
    } finally q.stop()
  }

  // window A [60,120): 30 users, some repeated; window B [120,180):
  // 250 distinct users — more than K, so the estimator path is real
  private val windowA =
    (0 until 40).map(i => ev(61 + (i % 50), (i % 30).toLong + 1))
  private val windowB = (0 until 250).map(i => ev(125 + (i % 40), 1000L + i))

  test("scala hashOf matches the batch SQL hash expression") {
    import spark.implicits._
    val ids = Seq(1L, 7L, 42L, 999L, 123456789L)
    val sql = ids.toDF("id")
      .select((conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long") / lit(1152921504606846976.0)).as("hu"))
      .collect().map(_.getDouble(0))
    ids.zip(sql).foreach { case (id, h) =>
      assert(KmvStream.hashOf(id) == h, s"hash mismatch for id $id")
    }
  }

  test("one micro-batch: sketch equals the batch bottom-k exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((w, e) <- exp) {
      assert(got.contains(w), s"missing window $w")
      assert(got(w) == e, s"window $w: ${got(w)} vs $e")
    }
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    // a watermark delay wider than the event span makes every arrival
    // order legal (nothing finalizes until the flush rows), so this
    // pins pure order-independence of the sketch state
    val all = windowA ++ windowB
    val shuffled = new scala.util.Random(7).shuffle(all.toVector)
    val exp = expected(all)
    val got = runStream(Seq(shuffled.take(37), shuffled.slice(37, 150),
      shuffled.drop(150)), delay = "500 seconds")
    for ((w, e) <- exp)
      assert(got.get(w).contains(e), s"window $w: ${got.get(w)} vs $e")
  }

  test("under-full window reports the exact count as its estimate") {
    val exp = expected(windowA)
    val got = runStream(Seq(windowA))
    val w = 60000L
    assert(exp(w)._2 == 30L && exp(w)._4 == 30.0)
    assert(got(w) == exp(w))
  }

  test("late row behind the watermark neither re-opens nor re-emits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = KmvStream(input.toDS(), WindowSec, "10 seconds")
      .writeStream.format("memory").queryName("kmv_late")
      .outputMode(KmvStream.outputMode).start()
    try {
      input.addData(windowA); q.processAllAvailable()
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      val n1 = spark.table("kmv_late").count()
      assert(n1 >= 1)
      // a row for the long-finalized window A must be dropped
      input.addData(Seq(ev(70, 9999L))); q.processAllAvailable()
      val rows = spark.table("kmv_late")
        .where(col("window_start") === new Timestamp(60000L)).collect()
      assert(rows.length == 1, "finalized window re-emitted")
      assert(rows(0).getLong(4 - 3) == 40L) // n_events unchanged (col 1)
    } finally q.stop()
  }
}
