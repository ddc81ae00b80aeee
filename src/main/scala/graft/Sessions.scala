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
    val b = SparkSession.builder().appName(app)
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit sets the spark.master system property — only pick a
    // master (and local-mode tuning) when none was submitted.
    if (!sys.props.contains("spark.master")) {
      b.master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    }
    b.getOrCreate()
  }
}
