package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also emits `hashes.json` — per-query mismatch FORENSICS. The r8 gate
  * reported 4 hash-fails that were bitwise-green under the committed
  * harness at three scale factors; the artifact carried nothing to say
  * WHICH column diverged driver-side. Now every query's written parquet
  * is read back and canonically rendered (columns sorted by name, row
  * strings sorted, IEEE-754 bit patterns for floats so −0.0 ≠ +0.0 and
  * NaN is canonical, plain-string decimals, epoch-µs timestamps), and
  * the artifact records the full-table hash, PER-COLUMN hashes, and the
  * first rows — `scripts/selfcheck.py --forensics` recomputes the same
  * canonical form from the DuckDB oracle, so any driver-side mismatch
  * names its diverging column without a local repro. */
object Verify {

  /** Canonical scalar rendering — mirrored by selfcheck.py `canon()`.
    * Doubles/floats render as 16-hex `Double.doubleToLongBits` (floats
    * upcast exactly), so the rendering is bitwise like the driver's
    * hash gate; decimals as plain strings (no E-notation); timestamps
    * as epoch micros; binary as hex; nulls as `∅`. */
  def canonValue(v: Any): String = v match {
    case null => "∅"
    case d: Double => f"${java.lang.Double.doubleToLongBits(d)}%016x"
    case f: Float => f"${java.lang.Double.doubleToLongBits(f.toDouble)}%016x"
    case b: java.math.BigDecimal => b.toPlainString
    case b: BigDecimal => b.underlying.toPlainString
    case t: java.sql.Timestamp => // floorDiv: exact for pre-1970 too
      (Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L).toString
    case t: java.time.Instant =>
      (t.getEpochSecond * 1000000L + t.getNano / 1000L).toString
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case a: Array[Byte] => a.map(b => f"$b%02x").mkString
    case s: Seq[_] => s.map(canonValue).mkString("[", ",", "]")
    case m: Map[_, _] => m.map { case (k, x) =>
      canonValue(k) + "=" + canonValue(x) }.toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      // sorted name=value pairs, matching selfcheck.py's dict branch
      // (DuckDB returns structs as Python dicts) — positional fallback
      // only for schema-less Rows, which no written parquet produces
      if (r.schema != null)
        r.schema.fieldNames.toSeq.zip(r.toSeq)
          .map { case (k, x) => canonValue(k) + "=" + canonValue(x) }
          .sorted.mkString("{", ",", "}")
      else r.toSeq.map(canonValue).mkString("(", ",", ")")
    case x => x.toString
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Read back a written result and render (tableHash, rowCount,
    * colName→colHash, head rows). Reads the PARQUET (what the driver
    * hashes), not the in-memory frame, so the forensics cover the
    * write+read path too. */
  /** Results larger than this skip forensics (logged): every oracle
    * query today returns a bounded report, but a future pair-list
    * shaped output growing with scale factor must not be collect()ed
    * onto the driver mid-sweep — an OOM there poisons the whole JVM. */
  val ForensicsMaxRows = 2000000L

  def forensics(spark: SparkSession, path: String)
      : (String, Long, Seq[(String, String)], Seq[String]) = {
    val df = spark.read.parquet(path)
    val n = df.count()
    require(n <= ForensicsMaxRows,
      s"forensics skipped: $n rows > $ForensicsMaxRows (driver-collect cap)")
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(r => r.toSeq.map(canonValue))
    // sort by the full rendered row so ordering is engine-independent;
    // per-column hashes use the SAME row order as the table hash, so a
    // single diverging column is named by exactly one hash delta
    val keyed = rows.map(_.mkString("|")).zipWithIndex.sortBy(_._1)
    val sorted = keyed.map(_._1)
    val order = keyed.map(_._2)
    val colHashes = cols.zipWithIndex.map { case (c, i) =>
      c -> md5hex(order.map(j => rows(j)(i)).mkString("\n"))
    }
    (md5hex(sorted.mkString("\n")), rows.length.toLong, colHashes,
      sorted.take(5).toSeq)
  }
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
    // name → (tableHash, rows, colHashes, headRows): the per-query
    // forensics block written to hashes.json at the end of the sweep
    val fx = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, Long, Seq[(String, String)], Seq[String])]
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // forensics must never fail the sweep — a render gap on an
        // exotic type loses that query's diagnostics, not its result
        try fx(name) = forensics(spark, s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name forensics skipped: $e") }
      }
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
    // hashes.json: {"q_x": {"rows": N, "hash": "...",
    //   "cols": {"a": "...", ...}, "head": ["r1", ...]}} — the
    // driver-side mismatch localizer (see scaladoc)
    val hjson = fx.map { case (name, (h, n, cols, head)) =>
      val cj = cols.map { case (c, ch) => s"${q(c)}: ${q(ch)}" }
        .mkString("{", ",", "}")
      val hj = head.map(q).mkString("[", ",", "]")
      s"${q(name)}: {${q("rows")}: $n, ${q("hash")}: ${q(h)}, " +
        s"${q("cols")}: $cj, ${q("head")}: $hj}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/hashes.json"), hjson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
