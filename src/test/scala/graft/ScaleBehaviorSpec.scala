package graft

import org.apache.spark.sql.functions._

/** Scale behaviors that only show on deliberately adversarial data:
  * the salted two-phase aggregation (the manual skew guard) must be
  * value-identical to the plain aggregation, AQE must handle a
  * skewed-key join, and partitioned output layout must prune at read
  * time. These are the behaviors a 100 TB deployment leans on; the
  * oracle queries can't exercise them because the test tables are
  * well-distributed. */
class ScaleBehaviorSpec extends SparkSpec {

  import spark.implicits._

  // one hot key carrying ~90% of rows + a long uniform tail
  private lazy val skewed = spark.range(100000)
    .select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id" % 997))
        .as("k"),
      ($"id" % 101).cast("double").as("v"))

  test("salted two-phase aggregation equals the direct aggregation on a skewed key") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum($"v"), 4).as("s"))
    // phase 1: aggregate on (k, salt) — the hot key's rows split over
    // 16 salts so no single task owns it; phase 2: merge the partials.
    val salted = skewed
      .withColumn("salt", pmod(hash($"v" * 7919), lit(16)))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("pn"), sum($"v").as("ps"))
      .groupBy("k")
      .agg(sum($"pn").as("n"), round(sum($"ps"), 4).as("s"))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val dim = (0 until 997).map(i => (s"k$i", i)).toDF("dk", "attr")
      .union(Seq(("hot", -1)).toDF("dk", "attr"))
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep the join a shuffle join: broadcast would hide the skew path
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // Global (not keyed) aggregate downstream: a groupBy on the join
      // key would REQUIRE the join's hash partitioning and AQE would
      // decline to split the skewed partition rather than re-shuffle.
      val res = skewed.join(dim, $"k" === $"dk").agg(count(lit(1)).as("n"))
      assert(res.collect().head.getLong(0) == 100000L) // every row joins
      // same QueryExecution, now final: AQE has replanned post-run
      val plan = res.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // The 100 TB shape: a huge fact scan sort-merge-joined to a
    // filtered dimension too big to broadcast. Spark 4's
    // InjectRuntimeFilter builds a bloom filter from the dim side's
    // join keys and pushes a might_contain probe into the fact scan —
    // rows that can't join die at the scan, not in the shuffle. At
    // laptop scale the size thresholds never trip, so model the
    // cluster shape explicitly: creation side under its threshold,
    // application side over (0). Equality with the unfiltered join is
    // asserted, not assumed.
    val conf = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // broadcast would already prune; force the shuffle-join shape
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      def join() = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "supplier").where($"s_acctbal" > 9000),
          $"l_suppkey" === $"s_suppkey")
        .groupBy("s_name").agg(sum($"l_quantity").as("q"))
      val filtered = join()
      val opt = filtered.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") && opt.contains("might_contain"),
        opt.take(2000))
      val expected = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try join().collect().map(r => (r.getString(0), r.getDouble(1))).toMap
        finally spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      }
      val got = filtered.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(got == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partitionBy output layout prunes partitions at read time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    val pruned = back.where($"lang" === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning),
    // not PushedFilters (row-group evaluation)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(2000))
    assert(pruned.count() == docs.where($"lang" === "en").count())
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the incremental daily-load primitive at 100 TB: re-running one
    // day's batch must rewrite THAT day's directory and leave every
    // other partition byte-identical — static overwrite mode would
    // drop the whole table first
    val dir = java.nio.file.Files.createTempDirectory("graft_dynpart").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(dir)
    val othersBefore = spark.read.parquet(dir)
      .where($"lang" =!= "en").count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // "corrected" re-run of just the en partition, halved
      val enFix = docs.where($"lang" === "en")
        .where($"doc_id" % 2 === 0)
      enFix.write.partitionBy("lang").mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.where($"lang" === "en").count() == enFix.count(),
        "touched partition must hold exactly the re-run's rows")
      assert(back.where($"lang" =!= "en").count() == othersBefore,
        "untouched partitions must survive the overwrite")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
