package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming portable HLL must be BIT-IDENTICAL to the batch
  * register computation over the same window's rows — registers are a
  * pure function of the inserted value set (per-bucket max), so
  * arrival order, batch splits, and duplicate re-insertions cannot
  * move them. The batch expectation reproduces q_hll_portable's exact
  * Spark SQL math (conv/md5 hash, bin()-length ρ, scaled-integer
  * denominator), so this spec also pins the Scala-side registerOf to
  * the SQL expressions.
  */
class HllPortableStreamSpec extends SparkSpec {

  import HllPortableStream.UserEvent

  private val WindowSec = 60L

  private def ev(sec: Long, uid: Long) = UserEvent(new Timestamp(sec * 1000), uid)

  /** windowStartMs -> (nEvents, registerSum, registerMax, zeros, est)
    * via the batch SQL expressions — the q_hll_portable math verbatim. */
  private def expected(rows: Seq[UserEvent])
      : Map[Long, (Long, Long, Long, Long, Double)] = {
    import spark.implicits._
    val cells = rows.toDS()
      .select(((col("ts").cast("long") / WindowSec).cast("long")
        * WindowSec * 1000).as("w"), col("userId"))
    val n = cells.groupBy("w").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val regs = cells.distinct()
      .select(col("w"),
        conv(substring(md5(col("userId").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .select(col("w"), (col("h") % 64).as("b"),
        call_function("shiftright", col("h"), lit(6)).as("rest"))
      .groupBy("w", "b")
      .agg(max(when(col("rest") === 0, 55)
        .otherwise(lit(55) - length(bin(col("rest"))))).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2)))
    regs.groupBy(_._1).map { case (w, g) =>
      val arr = new Array[Int](64)
      g.foreach { case (_, b, m) => if (m > arr(b)) arr(b) = m }
      val zeros = arr.count(_ == 0)
      val denom = arr.map(m => 1L << (55 - m)).sum
      val raw = 0.709 * 4096 * 36028797018963968.0 / denom
      val est = if (raw <= 160 && zeros > 0) 64 * math.log(64.0 / zeros) else raw
      w -> (n(w), arr.map(_.toLong).sum, arr.max.toLong, zeros.toLong, est)
    }
  }

  private def runStream(batches: Seq[Seq[UserEvent]],
      delay: String = "10 seconds")
      : Map[Long, (Long, Long, Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = HllPortableStream(input.toDS(), WindowSec, delay)
      .writeStream.format("memory").queryName("hllp_out")
      .outputMode(HllPortableStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // watermark from batch N drives timeouts during batch N+1
      input.addData(Seq(ev(100000, 1L))); q.processAllAvailable()
      input.addData(Seq(ev(100600, 1L))); q.processAllAvailable()
      spark.table("hllp_out").collect()
        .map(r => r.getTimestamp(0).getTime ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5)))
        .toMap
    } finally q.stop()
  }

  // window A [60,120): 30 users with repeats; window B [120,180):
  // 600 distinct users — above the 160 small-range cutoff, so the
  // raw harmonic path is exercised alongside A's ln-corrected path
  private val windowA =
    (0 until 40).map(i => ev(61 + (i % 50), (i % 30).toLong + 1))
  private val windowB = (0 until 600).map(i => ev(125 + (i % 40), 1000L + i))

  test("scala registerOf matches the batch SQL hash expressions") {
    import spark.implicits._
    val ids = Seq(1L, 7L, 42L, 999L, 123456789L)
    val sql = ids.toDF("id")
      .select(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .select((col("h") % 64).as("b"),
        call_function("shiftright", col("h"), lit(6)).as("rest"))
      .select(col("b"), when(col("rest") === 0, 55)
        .otherwise(lit(55) - length(bin(col("rest")))).as("m"))
      .collect().map(r => (r.getLong(0).toInt, r.getInt(1)))
    ids.zip(sql).foreach { case (id, e) =>
      assert(HllPortableStream.registerOf(id) == e, s"register mismatch for $id")
    }
  }

  test("one micro-batch: registers equal the batch computation exactly") {
    val exp = expected(windowA ++ windowB)
    val got = runStream(Seq(windowA ++ windowB))
    for ((w, e) <- exp) {
      assert(got.contains(w), s"missing window $w")
      assert(got(w) == e, s"window $w: ${got(w)} vs $e")
    }
  }

  test("multi-batch shuffled arrival: state carries, output unchanged") {
    val all = windowA ++ windowB
    val shuffled = new scala.util.Random(11).shuffle(all.toVector)
    val exp = expected(all)
    val got = runStream(Seq(shuffled.take(55), shuffled.slice(55, 300),
      shuffled.drop(300)), delay = "500 seconds")
    for ((w, e) <- exp)
      assert(got.get(w).contains(e), s"window $w: ${got.get(w)} vs $e")
  }

  test("small window takes the ln-corrected path, large the raw path") {
    val exp = expected(windowA ++ windowB)
    // window A: 30 distinct « 160 → correction; window B: 600 → raw
    val estA = exp(60000L)._5
    val estB = exp(120000L)._5
    assert(math.abs(estA - 30) / 30.0 <= 0.5, s"A estimate $estA")
    assert(math.abs(estB - 600) / 600.0 <= 0.5, s"B estimate $estB")
    val got = runStream(Seq(windowA ++ windowB))
    assert(got(60000L)._5 == estA && got(120000L)._5 == estB)
  }
}
