package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The Bloom dedup stream's contract: a seen key is NEVER re-emitted
  * (no false negatives, across batches and replays), the emitted set
  * is a subset of the exact first-seen set, the novel-suppression
  * rate stays under the analytic Bloom bound at the sized load, and
  * state stays the constant P·m/8 bytes by construction.
  */
class BloomDedupStreamSpec extends SparkSpec {

  import BloomDedupStream.{Keyed, Novel}

  private val Buckets = 4
  private val MBits = 1 << 14
  private val K = 5

  private def runStream(batches: Seq[Seq[Keyed]]): Seq[String] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val q = BloomDedupStream(input.toDS(), Buckets, MBits, K)
      .writeStream.format("memory").queryName("bloom_out")
      .outputMode(BloomDedupStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("bloom_out").collect().map(_.getString(0)).toSeq
    } finally q.stop()
  }

  test("a replayed key is never emitted twice, within or across batches") {
    val fps = (1 to 300).map(i => s"doc-$i")
    def kd(xs: Seq[String]) = xs.map(Keyed(_))
    val emitted = runStream(Seq(
      kd(fps.take(100) ++ fps.take(50)),        // within-batch replay
      kd(fps.slice(100, 200) ++ fps.take(100)), // cross-batch replay
      kd(fps ++ fps)))                          // full replay
    assert(emitted.size == emitted.distinct.size, "duplicate emission")
    assert(emitted.toSet.subsetOf(fps.toSet))
  }

  test("suppression of novel keys stays under the analytic Bloom bound") {
    val fps = (1 to 2000).map(i => s"fp-$i")
    val emitted = runStream(Seq(fps.map(Keyed(_))))
    // per-bucket load ≈ n/P inserts into m bits; allow 3x the bound
    // for hash variance on a finite corpus
    val bound = BloomDedupStream.fpRate(fps.size / Buckets, MBits, K)
    val suppressed = fps.size - emitted.size
    assert(suppressed <= math.max(3, 3 * bound * fps.size),
      s"$suppressed novel keys suppressed; analytic bound ${bound * fps.size}")
    assert(emitted.toSet.subsetOf(fps.toSet))
  }

  test("the stream's hash family equals the batch h32Salted column expression") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val fps = Seq("a", "doc-42", "ünïcøde 😀", "")
    val fromCol = fps.toDF("fp")
      .select(graft.functions.TextFunctions
        .h32Salted(lit(3), col("fp")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val fromScala = fps.map(BloomDedupStream.h32Salted(3, _))
    assert(fromCol == fromScala)
  }

  test("fpRate is monotone in load and sane at the sized operating point") {
    assert(BloomDedupStream.fpRate(500, MBits, K) <
      BloomDedupStream.fpRate(5000, MBits, K))
    assert(BloomDedupStream.fpRate(500, MBits, K) < 0.01)
  }
}
