package graft

import org.apache.spark.sql.SparkSession

/** The one session factory behind every entry point (Bench, Verify,
  * the streaming mains). When launched via spark-submit the submitted
  * master/conf win untouched; standalone (tests, local runs) it falls
  * back to local[SPARK_GRAFT_CPUS] with the engine's local tuning
  * (shuffle partitions = cores, AQE, UTC, no UI). */
object Sessions {
  def build(app: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's SQL functions ride every session this factory
    // builds; APPEND to (never clobber) extensions a spark-submit
    // already configured. Static conf — only effective for the session
    // that actually getOrCreate()s the context, like the master below.
    val ext = sys.props.get("spark.sql.extensions")
      .filter(_.nonEmpty)
      .map(e => if (e.contains("graft.GraftExtensions")) e
                else e + ",graft.GraftExtensions")
      .getOrElse("graft.GraftExtensions")
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", ext)
    // spark-submit sets the spark.master system property — only pick a
    // master when none was submitted. The local-mode tuning (shuffle
    // width = cores, UI off) applies ONLY when that master is actually
    // local[*]: SPARK_MASTER pointing at a real cluster must not get a
    // 4-wide shuffle and no UI.
    if (!sys.props.contains("spark.master")) {
      val master = sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]")
      b.master(master)
      if (master.startsWith("local")) {
        b.config("spark.sql.shuffle.partitions", cpus)
          .config("spark.sql.adaptive.enabled", "true")
          .config("spark.ui.enabled", "false")
      }
    }
    b.getOrCreate()
  }
}
