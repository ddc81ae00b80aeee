package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming HDR histogram must be BIT-IDENTICAL to the batch
  * bucket computation over the same window's rows — the histogram is a
  * pure function of the value multiset (per-bucket count-sum), so
  * arrival order and micro-batch splits cannot move it. The batch
  * expectation reproduces q_hdr_quantiles' exact Spark SQL bucket math
  * (length(bin(v)) bitlen, shift arithmetic, the (p·n+99) div 100
  * rank), so this spec also pins the Scala-side bucketOf/lbOf/rankOf
  * to the SQL expressions.
  */
class HdrSketchStreamSpec extends SparkSpec {

  import HdrSketchStream.{PriceEvent, bucketOf, lbOf, quantileLb, rankOf}

  private val WindowSec = 60L

  private def ev(sec: Long, cents: Long) =
    PriceEvent(new Timestamp(sec * 1000), cents)

  test("scala bucketOf matches the batch SQL bucket expressions") {
    import spark.implicits._
    // spans the exact region (< 128), the boundary, powers of two
    // (bucket lower bounds), and price-scale magnitudes
    val vs = Seq(1L, 2L, 127L, 128L, 129L, 255L, 256L, 90000L,
      5302816L, 10485759L, 10485760L, (1L << 40) - 1, 1L << 40)
    val sql = vs.toDF("v")
      .withColumn("bl", length(bin(col("v"))))
      .select(
        when(col("bl") <= 7, col("v"))
          .otherwise(col("bl").cast("long") * 64
            + call_function("shiftright", col("v"), (col("bl") - 7).cast("int"))
            - 64).as("idx"),
        when(col("bl") <= 7, col("v"))
          .otherwise(call_function("shiftleft",
            call_function("shiftright", col("v"), (col("bl") - 7).cast("int")),
            (col("bl") - 7).cast("int"))).as("lb"),
        when(col("bl") <= 7, col("v"))
          .otherwise(call_function("shiftleft",
            call_function("shiftright", col("v"), (col("bl") - 7).cast("int"))
              + 1, (col("bl") - 7).cast("int")) - 1).as("ub"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    vs.zip(sql).foreach { case (v, e) =>
      assert(bucketOf(v) == e, s"bucket mismatch for $v: ${bucketOf(v)} vs $e")
      assert(lbOf(e._1) == e._2, s"lbOf mismatch for idx ${e._1}")
    }
  }

  test("bucket guarantees: v in [lb, ub], width/lb <= 2^-6") {
    Seq(1L, 65L, 127L, 128L, 200L, 90000L, 123456789L, Long.MaxValue / 2)
      .foreach { v =>
        val (_, lb, ub) = bucketOf(v)
        assert(lb <= v && v <= ub, s"$v outside [$lb, $ub]")
        if (v >= 128)
          assert((ub - lb).toDouble / lb <= 1.0 / 64, s"width bound at $v")
      }
  }

  test("rankOf matches the batch integer ceil formula") {
    for (p <- Seq(50, 90, 95, 99); n <- Seq(1L, 7L, 100L, 60000L, 99999L)) {
      val want = math.ceil(p * n / 100.0).toLong
      assert(rankOf(p, n) == want, s"rank($p, $n)")
    }
  }

  // window A [60,120): skewed small prices with repeats; window B
  // [120,180): a wide magnitude spread crossing bucket boundaries
  private val windowA =
    (0 until 50).map(i => ev(61 + (i % 50), 100L + (i % 7) * 13))
  private val windowB =
    (0 until 400).map(i => ev(125 + (i % 40), 90000L + i.toLong * i * 37))

  /** windowStartMs -> expected output via a from-scratch fold. */
  private def expected(rows: Seq[PriceEvent])
      : Map[Long, (Long, Long, Long, Long, Long)] =
    rows.groupBy(e => e.ts.getTime / 1000 / WindowSec * WindowSec * 1000)
      .map { case (w, g) =>
        val hist = g.groupBy(e => bucketOf(e.cents)._1)
          .map { case (idx, es) => idx -> es.size.toLong }
        w -> ((g.size.toLong, hist.size.toLong, quantileLb(hist, 50),
          quantileLb(hist, 95), quantileLb(hist, 99)))
      }

  private def runStream(batches: Seq[Seq[PriceEvent]],
      delay: String = "10 seconds")
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[PriceEvent]
    val q = HdrSketchStream(input.toDS(), WindowSec, delay)
      .writeStream.format("memory").queryName("hdr_out")
      .outputMode(HdrSketchStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("hdr_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))))
        .toMap
    } finally q.stop()
  }

  test("one micro-batch: quantile bounds equal the batch fold exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((w, e) <- exp) {
      assert(got.contains(w), s"missing window $w")
      assert(got(w) == e, s"window $w: ${got(w)} vs $e")
    }
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val all = windowA ++ windowB
    val shuffled = new scala.util.Random(17).shuffle(all.toVector)
    val exp = expected(all)
    val got = runStream(Seq(shuffled.take(70), shuffled.slice(70, 300),
      shuffled.drop(300)), delay = "500 seconds")
    for ((w, e) <- exp)
      assert(got.get(w).contains(e), s"window $w: ${got.get(w)} vs $e")
  }

  test("quantile lb brackets the true order statistic within 2^-6") {
    val vals = windowB.map(_.cents).sorted
    val hist = windowB.groupBy(e => bucketOf(e.cents)._1)
      .map { case (idx, es) => idx -> es.size.toLong }
    for (p <- Seq(50, 95, 99)) {
      val exact = vals((rankOf(p, vals.size.toLong) - 1).toInt)
      val lb = quantileLb(hist, p)
      assert(lb <= exact, s"p$p: lb $lb above exact $exact")
      assert(exact - lb <= exact / 64 + 1, s"p$p: error bound")
    }
  }
}
