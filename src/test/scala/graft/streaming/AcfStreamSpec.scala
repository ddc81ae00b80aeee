package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming ACF/Ljung–Box monitor must produce EXACTLY the batch
  * q_ljung_box numbers on the same daily series — same micro-unit
  * values, same r_k / Q expression shapes, BigInt state standing in
  * for the batch DECIMAL(38,0) sums — whether the series arrives in
  * one micro-batch or split time-ordered across several (the
  * PageHinkleyStreamSpec parity contract for the O(L)-state ACF). A
  * synthetic AR(1) series additionally pins BEHAVIOR: strong positive
  * acf_1 and a huge Q on a persistent series, tiny Q on iid noise.
  */
class AcfStreamSpec extends SparkSpec {

  import AcfStream._

  private val dir = "/root/testdata/sf0.001"

  /** The batch query's own input series: micro-unit daily revenue in
    * day order (the q_ljung_box `o` frame). */
  private def dailySeries(): Seq[Long] = {
    import spark.implicits._
    graft.Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,6)"))
        .cast("decimal(15,4)").as("rev"))
      .select(col("day"), (col("rev") * 10000).cast("long").as("y"))
      .orderBy("day")
      .as[(java.sql.Date, Long)].collect().toSeq.map(_._2)
  }

  private def expected(): Map[Long, (Double, Double)] =
    SparkEntry.queries("q_ljung_box")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap

  private def runStream(batches: Seq[Seq[Long]])
      : Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ValuePoint]
    val q = AcfStream(input.toDS())
      .writeStream.format("memory").queryName("acf_out")
      .outputMode(AcfStream.outputMode).start()
    try {
      var t = 0L
      batches.foreach { b =>
        input.addData(b.map { v =>
          t += 1000; ValuePoint(new Timestamp(t), "rev", v)
        })
        q.processAllAvailable()
      }
      spark.table("acf_out").collect()
        .zipWithIndex
        .map { case (r, i) =>
          (r.getLong(2), (r.getLong(1), r.getDouble(3), r.getDouble(4)), i) }
        .groupBy(_._1)
        .map { case (k, vs) => k -> vs.maxBy(_._3)._2 }
    } finally q.stop()
  }

  private def assertParity(got: Map[Long, (Long, Double, Double)],
      n: Long): Unit = {
    val exp = expected()
    assert(got.keySet == exp.keySet, s"lags ${got.keySet} vs ${exp.keySet}")
    for ((k, (acf, q)) <- exp) {
      val (gn, gacf, gq) = got(k)
      assert(gn == n, s"lag $k n $gn vs $n")
      // batch emits round(x, 6) + 0.0; compare at that grid
      assert(math.abs(math.rint(gacf * 1e6) / 1e6 + 0.0 - acf) <= 1e-9,
        s"lag $k acf $gacf vs $acf")
      assert(math.abs(math.rint(gq * 1e6) / 1e6 + 0.0 - q) <= 1e-9,
        s"lag $k Q $gq vs $q")
    }
  }

  test("one micro-batch reproduces the batch q_ljung_box exactly") {
    val series = dailySeries()
    assertParity(runStream(Seq(series)), series.size.toLong)
  }

  test("time-ordered multi-batch arrival carries O(L) state to the same result") {
    val series = dailySeries()
    val c1 = series.size / 3
    val c2 = 2 * series.size / 3
    assertParity(runStream(Seq(series.take(c1),
      series.slice(c1, c2), series.drop(c2))), series.size.toLong)
  }

  test("behavior: AR(1) series lights up acf_1 and Q; iid noise does not") {
    val rnd = new scala.util.Random(7)
    var level = 10000.0
    val ar = Vector.fill(400) {
      level = 0.9 * level + 0.1 * 10000 + rnd.nextGaussian() * 200
      level.toLong
    }
    val iid = Vector.fill(400)(10000L + rnd.nextInt(2000))
    val gotAr = runStream(Seq(ar))
    val gotIid = runStream(Seq(iid))
    assert(gotAr(1L)._2 > 0.5, s"AR(1) acf1 ${gotAr(1L)._2} not strong")
    assert(gotAr(7L)._3 > 100.0, s"AR(1) Q ${gotAr(7L)._3} not large")
    // iid: Q(7) under the null is chi2_7; 40 is far beyond any tail
    assert(gotIid(7L)._3 < 40.0, s"iid Q ${gotIid(7L)._3} suspiciously large")
  }

  test("fold is chunk-associative: state composes across splits") {
    val rnd = new scala.util.Random(3)
    val vs = Vector.fill(100)(rnd.nextInt(100000).toLong)
    val whole = fold(empty, vs)
    val split = fold(fold(fold(empty, vs.take(10)), vs.slice(10, 57)),
      vs.drop(57))
    assert(whole.n == split.n && whole.syStr == split.syStr
      && whole.syyStr == split.syyStr
      && whole.ckStr.toSeq == split.ckStr.toSeq
      && whole.first.toSeq == split.first.toSeq
      && whole.last.toSeq == split.last.toSeq)
  }
}
