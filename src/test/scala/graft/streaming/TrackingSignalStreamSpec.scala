package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming tracking signal must reproduce the batch
  * `q_tracking_signal` reads exactly for a time-ordered arrival: the
  * fold adds errors in sequence order, which is how both engines'
  * batch cumulative windows accumulate, so parity is bit-level before
  * the batch side's 6-dp rounding. The parity test feeds the batch
  * query's own daily series through the stream and compares the
  * final/extreme/breach-count reads; the composition test splits the
  * series across micro-batches.
  */
class TrackingSignalStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Spark round()'s HALF_UP at 6 dp via BigDecimal.valueOf (the
    * HmmStreamSpec r12-ADVICE convention). */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  /** The batch query's input series: exact-decimal daily revenue in
    * day order, as identical doubles. */
  private def dailySeries(): Seq[Double] =
    graft.Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      .orderBy("day")
      .collect()
      .map(_.getDecimal(1).doubleValue())
      .toSeq

  private def runStream(batches: Seq[Seq[(String, Long, Double)]])
      : Seq[TrackingSignalStream.TsOut] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, Double)]
    val q = TrackingSignalStream(input.toDS())
      .writeStream.format("memory").queryName("ts_out")
      .outputMode(TrackingSignalStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("ts_out").as[TrackingSignalStream.TsOut]
        .collect().sortBy(_.t).toSeq
    } finally q.stop()
  }

  test("step fold matches a from-scratch cumulative recursion") {
    val rnd = new scala.util.Random(7)
    val ys = Vector.fill(300)(rnd.nextDouble() * 1000)
    var st = TrackingSignalStream.TsState(0.0, hasPrev = false, 0L,
      0.0, 0.0)
    var prev = 0.0
    var ce = 0.0; var sae = 0.0; var n = 0L; var first = true
    ys.foreach { y =>
      val (st2, out) = TrackingSignalStream.step(st, y)
      st = st2
      if (first) { first = false; assert(out.isEmpty) }
      else {
        val err = y - prev
        n += 1; ce += err; sae += math.abs(err)
        assert(out.get._2 == ce / (sae / n), s"TS drift at n=$n")
      }
      prev = y
    }
    assert(st.n == 299)
  }

  test("one-batch stream equals the batch q_tracking_signal reads") {
    val ys = dailySeries()
    assert(ys.size > 10)
    val rows = ys.zipWithIndex.map { case (y, i) =>
      ("rev", (i + 1).toLong, y)
    }
    val got = runStream(Seq(rows))
    val batch = SparkEntry.queries("q_tracking_signal")(spark, dir)
      .collect()(0)
    assert(got.size == ys.size - 1)
    assert(round6(got.last.ts) == batch.getAs[Double]("final_ts"))
    val extreme = got.maxBy(o => (math.abs(o.ts), -o.t))
    assert(round6(extreme.ts) == batch.getAs[Double]("extreme_ts"))
    assert(got.count(_.breach).toLong == batch.getAs[Long]("n_beyond_4"))
  }

  test("multi-batch arrival composes state: output unchanged") {
    val ys = dailySeries()
    val rows = ys.zipWithIndex.map { case (y, i) =>
      ("rev", (i + 1).toLong, y)
    }
    val whole = runStream(Seq(rows))
    val split = runStream(rows.grouped(97).toSeq)
    assert(whole.size == split.size)
    whole.zip(split).foreach { case (a, b) =>
      assert(a.t == b.t && a.ts == b.ts && a.breach == b.breach,
        s"t=${a.t}: ${a.ts} vs ${b.ts}")
    }
  }
}
