package graft

/** Driver-contract smoke tests. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries deliberately shipped without an oracle (driver falls back to
    * the weaker rows-only check): engine-specific sketch estimates.
    */
  private val rowsOnlyQueries = Set("q60_approx_distinct", "q63_approx_percentile")

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- rowsOnlyQueries).subsetOf(o),
      s"queries unexpectedly missing oracles: ${q -- o -- rowsOnlyQueries}")
  }

  test("all queries execute on sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
