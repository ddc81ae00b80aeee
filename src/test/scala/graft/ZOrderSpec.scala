package graft

import java.nio.file.Files

import graft.sources.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-order must (1) compute the textbook Morton interleave and
  * (2) actually cluster: every z-written file covers a small rectangle
  * of the 2-D space, where a linear sort leaves the second dimension
  * spanning the full range in every file.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zvalue matches the bit-loop reference on signed ints") {
    val samples = Seq((0, 0), (1, 0), (0, 1), (3, 5), (1023, 77),
      (-1, 0), (0, -1), (-5, -9), (Int.MaxValue, Int.MinValue))
    val got = samples.toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    val want = samples.map { case (a, b) =>
      // bit 63 flipped: signed comparison == unsigned Morton order
      mortonRef(a.toLong + (1L << 31), b.toLong + (1L << 31)) ^ Long.MinValue
    }
    assert(got.toSeq == want)
  }

  test("signed long ordering of zvalue equals unsigned Morton ordering") {
    // Mixed-sign inputs: without the bit-63 flip, every b >= 0 row
    // sorts before every b < 0 row (z bit 63 carries b's top bit) and
    // the boundary file would span the whole b range.
    val samples = for (a <- Seq(-7, -1, 0, 3, 900); b <- Seq(-900, -2, 0, 5, 81))
      yield (a, b)
    val zs = samples.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zvalue(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val bySigned = zs.sortBy(_._2).map(_._1).toSeq
    val byUnsignedMorton = samples.sortWith { case ((a1, b1), (a2, b2)) =>
      java.lang.Long.compareUnsigned(
        mortonRef(a1.toLong + (1L << 31), b1.toLong + (1L << 31)),
        mortonRef(a2.toLong + (1L << 31), b2.toLong + (1L << 31))) < 0
    }
    assert(bySigned == byUnsignedMorton)
  }

  /** Average per-file span of `c`, normalized by the global span. */
  private def avgSpan(dir: String, c: String): Double = {
    val df = spark.read.parquet(dir)
    val Array(glo) = df.agg((max(col(c)) - min(col(c))).cast("double")).collect()
    val spans = df.groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).cast("double").as("s"))
      .select(avg("s")).as[Double].head()
    spans / glo.getDouble(0)
  }

  test("z-written files tile both dimensions; linear sort only one") {
    val events = Tables(spark, "/root/testdata/sf0.01", "events")
      .select(col("user_id").cast("int").as("u"),
        // scale value (0..490) to user_id's bit width (0..149, 8
        // bits) — Morton tiles degrade when one dimension owns the
        // high bits (the same reason Delta range-bins before
        // interleaving)
        (col("value") / 2).cast("int").as("v"))

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val linDir = Files.createTempDirectory("graft-linear").toString
    ZOrder.writeZOrdered(events, col("u"), col("v"), zDir, 8)
    events.repartitionByRange(8, col("u"))
      .sortWithinPartitions("u")
      .write.mode("overwrite").parquet(linDir)

    val (zU, zV) = (avgSpan(zDir, "u"), avgSpan(zDir, "v"))
    val (lU, lV) = (avgSpan(linDir, "u"), avgSpan(linDir, "v"))

    // linear: first dim tightly clustered; second dim's span is what
    // it is (value's sparse tail keeps the per-file max away from the
    // global max, so assert z-order's improvement RELATIVE to it)
    assert(lU < 0.35, s"linear u span $lU")
    // z-order: BOTH dims bounded — u still clustered, v strictly
    // tighter than the linear layout ever makes it
    assert(zU < 0.6, s"zorder u span $zU")
    assert(zV < 0.75 * lV, s"zorder v span $zV vs linear $lV")

    // and no data lost in the re-layout
    assert(spark.read.parquet(zDir).count() == events.count())
  }
}
