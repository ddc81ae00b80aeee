package graft


import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides bucketed by the join
  * key join WITHOUT a shuffle — the physical plan must contain no
  * Exchange. This is the §2.2 "pre-partitioned/co-located join" scale
  * path (at 100 TB: bucketed fact tables make repeated key-joins
  * shuffle-free forever after one write). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    // (warehouse dir is a static conf — tables land in the default
    // spark-warehouse/, dropped in the finally and gitignored)
    val sf = "/root/testdata/sf0.001"
    val o = Tables(spark, sf, "orders")
    val l = Tables(spark, sf, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      // disable broadcast so the join strategy is the bucketed SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself must be exchange-free (the final groupBy may
      // shuffle): no Exchange below the SortMergeJoin
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"), joinPart)
      // and it still computes the right thing
      assert(joined.collect().map(_.getLong(1)).sum == l.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("incremental dedup probe against a bucketed fingerprint index shuffles only the new batch") {
    // The q_dedup_incremental shape at steady state: the corpus
    // fingerprint index is a persisted bucketed table, so the daily
    // probe shuffles ONLY the (small) new batch into the index's
    // bucketing — the 100 TB index side never moves.
    import graft.functions.TextFunctions.fingerprint
    val sf = "/root/testdata/sf0.001"
    val fps = Tables(spark, sf, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
    fps.where(col("doc_id") % 10 =!= 9)
      .write.mode("overwrite").bucketBy(8, "fp").sortBy("fp").saveAsTable("fp_index")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val nb = fps.where(col("doc_id") % 10 === 9)
      val dups = nb.join(spark.table("fp_index").select("fp"), Seq("fp"), "left_semi")
      val plan = dups.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // exactly one Exchange: the probe batch aligning to the buckets
      assert("Exchange".r.findAllMatchIn(plan).size == 1, plan)
      // and the probe result matches the unbucketed computation
      val expected = nb.join(
        fps.where(col("doc_id") % 10 =!= 9).select("fp"), Seq("fp"), "left_semi").count()
      assert(dups.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS fp_index")
    }
  }
}
