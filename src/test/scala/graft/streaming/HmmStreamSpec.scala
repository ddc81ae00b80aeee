package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming HMM forward filter must reproduce the batch
  * `q_hmm_forward` posterior EXACTLY for a time-ordered arrival: the
  * fold runs the batch recursion's operation order, so parity is
  * bit-level before the batch side's 6-dp rounding. The parity test
  * feeds the batch query's OWN (t, obs) sequence through the stream
  * and compares per-step posteriors against the batch emission; the
  * composition test splits the sequence across micro-batches.
  */
class HmmStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Spark round()'s HALF_UP at 6 dp (math.rint would be HALF_EVEN).
    * valueOf, not new BigDecimal (r12 ADVICE): Spark's Round goes
    * through BigDecimal.valueOf (shortest decimal repr of the
    * double), while `new BigDecimal` expands the exact binary value —
    * a value whose shortest repr straddles a 5e-7 half-boundary would
    * round differently and fail the parity test spuriously. */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0

  private def batchRows(): Seq[(Long, Long, Double)] =
    SparkEntry.queries("q_hmm_forward")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq

  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : Map[Long, Double] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long, Long)]
    val q = HmmStream(input.toDS())
      .writeStream.format("memory").queryName("hmm_out")
      .outputMode(HmmStream.outputMode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("hmm_out").collect()
        .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    } finally q.stop()
  }

  test("step fold matches a from-scratch normalized recursion") {
    val rnd = new scala.util.Random(11)
    val obs = Vector.fill(200)(rnd.nextInt(2).toLong)
    var st = HmmStream.HmmState(0.0, 0.0, 0L, started = false)
    // independent recursion carrying full normalization each step
    var p1 = 0.0; var p2 = 0.0; var started = false
    obs.foreach { o =>
      val b1 = if (o == 1) 0.8 else 0.2
      val b2 = if (o == 1) 0.3 else 0.7
      val (a1, a2) =
        if (!started) { started = true; (b1 * 0.5, b2 * 0.5) }
        else (b1 * (p1 * 0.9 + p2 * 0.2), b2 * (p1 * 0.1 + p2 * 0.8))
      p1 = a1 / (a1 + a2); p2 = a2 / (a1 + a2)
      st = HmmStream.step(st, o)
      assert(st.a1 / (st.a1 + st.a2) == p1, s"posterior drift at n=${st.n}")
    }
    assert(st.n == 200)
  }

  test("one-batch stream equals the batch q_hmm_forward posterior") {
    val exp = batchRows()
    assert(exp.nonEmpty, "batch query emitted no rows")
    val got = runStream(Seq(exp.map { case (t, o, _) => ("rev", t, o) }))
    exp.foreach { case (t, _, p) =>
      val g = got(t)
      assert(round6(g) == p, s"t=$t stream $g vs batch $p")
    }
  }

  test("multi-batch arrival composes state: output unchanged") {
    val exp = batchRows()
    val rows = exp.map { case (t, o, _) => ("rev", t, o) }
    val cut1 = rows.length / 3
    val cut2 = 2 * rows.length / 3
    val got = runStream(Seq(rows.take(cut1),
      rows.slice(cut1, cut2), rows.drop(cut2)))
    exp.foreach { case (t, _, p) =>
      val g = got(t)
      assert(round6(g) == p, s"t=$t split-stream $g vs batch $p")
    }
  }
}
