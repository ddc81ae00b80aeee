package graft
import org.apache.spark.sql.SparkSession
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
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
