package graft

import org.apache.spark.sql.functions._

/** Flagship-shape semantics (SURVEY.md §2.1): open intervals, NULLS LAST,
  * empty-input aggregation. */
class FlagshipSpec extends SparkTestBase {
  import spark.implicits._

  test("open interval excludes exact boundary values") {
    val df = Seq((1, 1.5), (2, 1.55), (3, 1.6)).toDF("id", "x")
    val got = df.filter($"x" > 1.5 && $"x" < 1.6).select("id")
      .as[Int].collect()
    assert(got.toSeq == Seq(2))
  }

  test("asc_nulls_last sorts nulls after values (DuckDB default order)") {
    val df = Seq(Some(2.0), None, Some(1.0)).toDF("e")
    val got = df.orderBy(asc_nulls_last("e")).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(1.0), Some(2.0), None))
  }

  test("grouped aggregation over empty input yields zero rows") {
    val df = Seq((1, 2.0)).toDF("k", "v").filter($"v" > 100)
    assert(df.groupBy("k").agg(avg("v")).count() == 0)
  }

  test("entry() returns rows on sf0.001 (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).count()
    assert(rows > 0)
  }
}
