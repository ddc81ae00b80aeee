package graft
object ProfileQ {
  def main(args: Array[String]): Unit = {
    // Same factory as Bench/Verify — a hand-rolled session here would
    // profile a configuration (cores, timezone, shuffle width) that
    // the measured entry points never run.
    val spark = Sessions.build("graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val sf = args(1)
    val fn = SparkEntry.queries(name)
    // warm
    Tables(spark, sf, "region").count()
    val t0 = System.nanoTime()
    val df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println(f"TIMED ${(System.nanoTime()-t0)/1e9}%.2f s")
    if (args.length > 2) df.explain("formatted")
    spark.stop()
  }
}
