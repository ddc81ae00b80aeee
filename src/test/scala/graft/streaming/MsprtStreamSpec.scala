package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming sequential monitor must reproduce the registered
  * batch `q_msprt` rows EXACTLY (same rounded theta/Λ/p per day) when
  * the sf0.01 events table is replayed through it — whether a day's
  * rows arrive in one micro-batch or split across several — and a
  * late row behind the watermark must not change an already-emitted
  * decision (the always-valid-p monotonicity contract).
  *
  * Parity precondition (holds for this table, asserted): every day
  * carries both variants — the batch query's per-day inner join drops
  * a day missing an arm, while the stream would still emit it once
  * both cumulative arms have n >= 2.
  */
class MsprtStreamSpec extends SparkSpec {

  import MsprtStream.{VEvent, MsprtPoint}

  private val sf = "/root/testdata/sf0.01"

  private def loadEvents(): Seq[VEvent] = {
    import spark.implicits._
    Tables(spark, sf, "events")
      .select(col("ts"),
        (get_json_object(col("props"), "$.k").cast("int") % 2).as("variant"),
        col("value"))
      .orderBy("ts")
      .as[(Timestamp, Int, Double)].collect().toSeq
      .map { case (ts, v, x) => VEvent(ts, v, x) }
  }

  private def batchRows(): Map[Long, (Long, Long, Double, Double, Double, Boolean)] = {
    import spark.implicits._
    SparkEntry.queries("q_msprt")(spark, sf)
      .as[(Timestamp, Long, Long, Double, Double, Double, Boolean)]
      .collect()
      .map(r => r._1.getTime -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
  }

  private def runStream(batches: Seq[Seq[VEvent]]): Map[Long, (Long, Long, Double, Double, Double, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[VEvent]
    val q = MsprtStream(input.toDS(), "0 seconds")
      .writeStream.format("memory").queryName("msprt_out")
      .outputMode(MsprtStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // sentinel far past the data + a nudge: the watermark computed
      // at the end of batch N drives timeouts during batch N+1, and
      // the sentinel's own day never finalizes (absent from batch too)
      val sentinel = VEvent(new Timestamp(4102444800000L), 0, 0.0)
      input.addData(Seq(sentinel)); q.processAllAvailable()
      input.addData(Seq(sentinel)); q.processAllAvailable()
      val rows = spark.table("msprt_out").as[MsprtPoint].collect()
      // single-emission contract: toMap would silently dedupe a day
      // emitted twice (review find, r8)
      assert(rows.map(_.day.getTime).distinct.length == rows.length,
        s"a day was emitted more than once: ${rows.map(_.day).mkString(",")}")
      rows.map(p => p.day.getTime ->
          ((p.n_a, p.n_b, p.theta, p.lambda, p.p_always_valid, p.reject_h0)))
        .toMap
    } finally q.stop()
  }

  test("replayed events reproduce the batch q_msprt rows exactly") {
    val evs = loadEvents()
    // precondition: both arms present every day (see scaladoc)
    val byDay = evs.groupBy(_.ts.getTime / 86400000L)
    assert(byDay.values.forall(d => d.map(_.variant).distinct.size == 2))
    val exp = batchRows()
    assert(exp.nonEmpty)
    // three chronological chunks — several days per micro-batch, one
    // day (the chunk boundary's) split ACROSS micro-batches
    val chunks = evs.grouped(math.max(1, evs.size / 3 + 1)).toSeq
    val got = runStream(chunks)
    assert(got.keySet == exp.keySet,
      s"day sets differ: missing ${exp.keySet -- got.keySet}, extra ${got.keySet -- exp.keySet}")
    exp.foreach { case (day, e) =>
      assert(got(day) == e, s"day $day: stream ${got(day)} vs batch $e")
    }
  }

  test("a late row behind the watermark cannot change an emitted decision") {
    val evs = loadEvents()
    val exp = batchRows()
    // replay everything, then inject a large late value into the FIRST
    // day (long finalized) — output must equal the clean run
    val late = VEvent(evs.head.ts, 1, 99999.0)
    val got = runStream(Seq(evs, Seq(late)))
    assert(got.keySet == exp.keySet)
    exp.foreach { case (day, e) =>
      assert(got(day) == e, s"late row altered day $day: ${got(day)} vs $e")
    }
  }
}
