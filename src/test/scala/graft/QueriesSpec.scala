package graft

/** Contract checks over the whole inventory: every query builds and runs at
  * sf0.001; oracle keys align with query keys; results carry at least one
  * column; per-query isolation (a bad dir fails one query, not the JVM). */
class QueriesSpec extends SparkTestBase {

  test("every oracleSql key has a corresponding queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every query runs at sf0.001 and has a schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf0001)
          assert(df.columns.nonEmpty)
          df.count() // force full execution
          None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("queries against a missing dir throw (isolation is caller's job)") {
    intercept[Throwable] {
      SparkEntry.queries("q_scan_count")(spark, "/no/such/dir").count()
    }
  }
}
