package graft

/** Smoke: driver contract holds — entry() returns rows, every
  * registered query runs at sf0.001, every oracle key exists. */
class QueriesSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and oracles reference registered queries") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registered query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable =>
        // String.valueOf: a null message (bare NPE) must not abort the
        // sweep with an NPE in the reporter itself
        Some(s"$name: ${String.valueOf(e.getMessage).take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
