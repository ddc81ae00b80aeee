package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query names — dev-only
    // subset for fast targeted oracle iteration (scripts/selfcheck.py
    // --only). The driver always runs the 2-arg full sweep.
    val selected = SparkEntry.select(args.lift(2))
    val spark = Sessions.build("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures must be loud IN THE ARTIFACT, not only on stderr: a
    // query that throws gets an errors.json entry, so a reader diffing
    // round artifacts sees it fail rather than silently vanish.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // e.toString keeps the class for message-less throwables (a
        // bare NPE printed "failed: null")
        System.err.println(s"[verify] $name failed: $e")
        errors(name) = e.toString.take(2000)
        // A reused outDir may hold the PREVIOUS run's parquet for this
        // query — delete it, or the compare would check stale results
        // against the oracle and report a regression as a pass.
        val stale = Paths.get(outDir, name)
        if (Files.exists(stale)) {
          import scala.jdk.CollectionConverters._
          // Files.walk holds directory handles until closed — leak one
          // per failed query in the sweep without the try/finally.
          val walk = Files.walk(stale)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(p => Files.deleteIfExists(p))
          finally walk.close()
        }
      }
      // bound memory across the full query sweep (several queries
      // cache multi-consumer intermediates; localCheckpoint blocks
      // are not CacheManager entries and need their own unpersist)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
