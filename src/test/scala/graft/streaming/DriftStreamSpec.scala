package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming drift monitor must reproduce the batch
  * q_wasserstein_1d numbers EXACTLY when fed one arm as the window
  * and the other arm as the reference histogram — the histogram is a
  * pure function of the window's value multiset, so arrival order and
  * micro-batch splits cannot move the scaled-integer W1/KS outputs.
  */
class DriftStreamSpec extends SparkSpec {

  import DriftStream.ValueEvent

  private val sf = "/root/testdata/sf0.001"
  private val WindowSec = 60L

  /** (arm0 cents, arm1 cents) for one event type — the batch query's
    * exact quantization and split. */
  private def arms(ty: String): (Seq[Long], Seq[Long]) = {
    import spark.implicits._
    val rows = Tables(spark, sf, "events")
      .where(col("event_type") === ty)
      .select((get_json_object(col("props"), "$.k").cast("int") % 2),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .as[(Int, Long)].collect()
    (rows.filter(_._1 == 0).map(_._2).toSeq,
      rows.filter(_._1 == 1).map(_._2).toSeq)
  }

  private def hist(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }

  private def runStream(batches: Seq[Seq[ValueEvent]], ref: Map[Long, Long],
      delay: String = "10 seconds"): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ValueEvent]
    val q = DriftStream(input.toDS(), ref, WindowSec, delay)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode(DriftStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq(ValueEvent(new Timestamp(100000 * 1000), 1L)))
      q.processAllAvailable()
      input.addData(Seq(ValueEvent(new Timestamp(100600 * 1000), 1L)))
      q.processAllAvailable()
      spark.table("drift_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    } finally q.stop()
  }

  test("window-vs-reference equals the batch q_wasserstein_1d exactly") {
    val ty = "click"
    val (a, b) = arms(ty)
    // batch row: arm0 vs arm1 of the same type
    val batch = SparkEntry.queries("q_wasserstein_1d")(spark, sf).collect()
      .find(_.getString(0) == ty).get
    // stream arm0 as one window, arm1 as the fixed reference
    val evs = a.zipWithIndex.map { case (c, i) =>
      ValueEvent(new Timestamp((61 + i % 50) * 1000), c) }
    val got = runStream(Seq(evs), hist(b))
    val (n, w1s, kss) = got(60000L)
    assert(n == a.size.toLong)
    assert(w1s == batch.getAs[Long]("w1_scaled"),
      s"w1 $w1s vs ${batch.getAs[Long]("w1_scaled")}")
    assert(kss == batch.getAs[Long]("ks_scaled"),
      s"ks $kss vs ${batch.getAs[Long]("ks_scaled")}")
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val (a, b) = arms("view")
    val evs = new scala.util.Random(23).shuffle(
      a.zipWithIndex.map { case (c, i) =>
        ValueEvent(new Timestamp((61 + i % 50) * 1000), c) }.toVector)
    // long delay: shuffled cross-batch arrival must not drop late rows
    val one = runStream(Seq(evs), hist(b), delay = "500 seconds")
    val many = runStream(Seq(evs.take(30), evs.slice(30, 90),
      evs.drop(90)), hist(b), delay = "500 seconds")
    assert(one == many, s"$one vs $many")
  }

  test("identical window and reference drift to exactly zero") {
    val (a, _) = arms("error")
    val evs = a.zipWithIndex.map { case (c, i) =>
      ValueEvent(new Timestamp((61 + i % 50) * 1000), c) }
    val got = runStream(Seq(evs), hist(a))
    val (_, w1s, kss) = got(60000L)
    assert(w1s == 0L && kss == 0L, "self-drift must be zero")
  }

  test("distinct-value cap enforces the exact-histogram contract") {
    // r11 VERDICT #5: >cap distinct values in one open window must
    // FAIL FAST with the sizing message, not grow state silently.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[ValueEvent]
    val q = DriftStream(input.toDS(), Map(1L -> 1L), WindowSec,
        "10 seconds", maxDistinct = 100)
      .writeStream.format("memory").queryName("drift_cap_out")
      .outputMode(DriftStream.outputMode).start()
    try {
      input.addData((1L to 101L).map(v =>
        ValueEvent(new Timestamp(30 * 1000), v)))
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
