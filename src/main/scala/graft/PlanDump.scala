package graft

/** Dump `.explain("formatted")` for a set of queries to files — the
  * optimization-round evidence trail (plans/r13/<q>_<tag>.txt). One
  * JVM for the whole list, so a 20-query snapshot doesn't pay 20
  * session bootstraps.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> q_a,q_b,...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, names) = args.take(4)
    val spark = Sessions.build("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${n}_$tag.txt"), txt)
      println(s"[plandump] $n -> ${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
