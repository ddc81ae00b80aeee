package graft

import graft.operators.GlobalPrefix
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-pass prefix sum must agree with the one-task global window
  * it replaces — on ascending and descending unique orders, long and
  * double values, and with more partitions than rows (empty-partition
  * offsets).
  */
class GlobalPrefixSpec extends SparkSpec {

  import spark.implicits._

  test("running total matches the global-window reference (long, asc)") {
    val df = (1 to 257).map(i => (i.toLong, (i * 37 % 101).toLong))
      .toDF("k", "v")
    val got = GlobalPrefix.runningTotal(df, Seq(col("k")), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("running total matches the reference on a descending double order") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7) + i / 100.0))
      .toDF("k", "v")
    val order = Seq(col("v").desc, col("k"))
    val got = GlobalPrefix.runningTotal(df, order, col("v"), "cum")
      .select("k", "cum").as[(Long, Double)].collect().sortBy(_._1)
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Double)].collect().sortBy(_._1)
    got.zip(want).foreach { case ((k1, c1), (k2, c2)) =>
      assert(k1 == k2 && math.abs(c1 - c2) < 1e-9, s"$k1: $c1 vs $c2")
    }
  }

  test("grand total rides the per-partition totals, not a second scan") {
    val df = (1 to 50).map(i => (i.toLong, 2L)).toDF("k", "v")
    val (ranked, grand) = GlobalPrefix.runningTotalWithGrand(
      df, Seq(col("k")), col("v"), "cum")
    assert(grand.as[Long].head() == 100L)
    // inclusive: the max cum equals the grand total
    assert(ranked.agg(max("cum")).as[Long].head() == 100L)
  }

  test("exclusive running max matches the global-window reference") {
    val df = (1 to 300).map(i => (i.toLong, ((i * 53) % 97).toDouble))
      .toDF("k", "v")
    val got = GlobalPrefix.runningMaxExclusive(df, Seq(col("k")), col("v"), "m")
      .select("k", "m").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    val want = df.withColumn("m",
        max(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select("k", "m").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    assert(got.head._2.isEmpty) // global first row has no predecessor
    assert(got.toSeq == want.toSeq)
  }

  test("more partitions than rows: empty partitions don't shift offsets") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      .repartition(16)
    val got = GlobalPrefix.runningTotal(df, Seq(col("k")), col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
  }

  test("heavy ties across sampled boundaries stay in one bucket (mixed-dir key)") {
    // 2000 rows over only 7 distinct primary keys: every sampled
    // boundary lands ON a duplicated value, so correctness requires
    // the tiebreaker column to disambiguate — exactly the shape that
    // would expose a non-monotone bucket assignment.
    val df = (1 to 2000).map(i => (i % 7L, i.toLong, (i % 13).toLong))
      .toDF("g", "id", "v")
    val order = Seq(col("g").desc, col("id"))
    val got = GlobalPrefix.runningTotal(df, order, col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("string sort keys bucket correctly") {
    val df = (1 to 500).map(i => (f"doc_${(i * 7919) % 501}%04d", 1L))
      .toDF("k", "v")
    val got = GlobalPrefix.runningTotal(df, Seq(col("k")), col("v"), "rk")
      .select("k", "rk").as[(String, Long)].collect().sortBy(_._1)
    val want = df.withColumn("rk",
        sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "rk").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("string keys beyond the BMP bucket by Spark's UTF-8 order, not Java's UTF-16") {
    // U+E000 (private use, 3-byte UTF-8 EE 80 80) vs U+1F600 (emoji,
    // 4-byte F0 9F 98 80): Java's UTF-16 compareTo puts E000 AFTER the
    // surrogate pair, Spark's UTF8String comparison puts it BEFORE —
    // a driver-side sample sorted with Java ordering would pick
    // boundaries that are DECREASING under Spark's order and silently
    // mis-rank every row between them.
    val df = (1 to 600).map { i =>
      val k = (i % 3) match {
        case 0 => s"_${"%04d".format(i)}"
        case 1 => s"😀_${"%04d".format(i)}" // 😀
        case _ => s"a_${"%04d".format(i)}"
      }
      (k, 1L)
    }.toDF("k", "v")
    val got = GlobalPrefix.runningTotal(df, Seq(col("k")), col("v"), "rk")
      .select("k", "rk").as[(String, Long)].collect().sortBy(_._1)
    val want = df.withColumn("rk",
        sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "rk").as[(String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("wide shuffle width with heavy ties stays correct under the chain-size budget") {
    // At shuffle.partitions=200 with a 7-value primary key, untruncated
    // boundaries would rebuild the over-JIT-limit comparison chain; the
    // budget halves the boundary list instead. Correctness must be
    // unaffected (fewer, larger buckets only).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "200")
      val df = (1 to 3000).map(i => (i % 7L, i.toLong, (i % 11).toLong))
        .toDF("g", "id", "v")
      val order = Seq(col("g"), col("id"))
      val got = GlobalPrefix.runningTotal(df, order, col("v"), "cum")
        .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
      val want = df.withColumn("cum",
          sum(col("v")).over(Window.orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("non-default null ordering is rejected, not silently mis-bucketed") {
    val df = Seq((1L, 1L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GlobalPrefix.runningTotal(df, Seq(col("k").asc_nulls_last), col("v"), "c")
    }
    assert(e.getMessage.contains("null ordering"))
  }
}
