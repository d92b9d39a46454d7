package graft

import org.apache.spark.sql.functions._

/** plans.TinySortSingularize: a global ORDER BY over a runtime-verified
  * tiny AQE stage drops the range exchange for a single-partition local
  * sort — identical output, no boundary-sampling job. */
class TinySortSpec extends SparkTestBase {
  import spark.implicits._

  // TinyAggSingularize would make these plans exchange-free before the
  // sort rule ever runs — disable it so the suite exercises the
  // TinySortSingularize path specifically.
  private def withoutTinyAgg[A](body: => A): A = {
    spark.conf.set("spark.graft.tinyAgg.enabled", "false")
    try body finally spark.conf.set("spark.graft.tinyAgg.enabled", "true")
  }

  test("tiny agg+sort loses its range exchange; output order unchanged") {
    withoutTinyAgg {
    val df = ops.table(spark, sf0001, "lineitem")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .orderBy(desc("n"), asc("l_returnflag"))
    val rows = df.collect()
    // toString prints "== Final Plan ==" followed by "== Initial Plan ==";
    // only the final section reflects the adaptive rewrite.
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!finalPlan.contains("rangepartitioning"),
      s"tiny sort kept its range exchange:\n$finalPlan")
    spark.conf.set("spark.graft.tinySort.enabled", "false")
    try {
      val expected = ops.table(spark, sf0001, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
        .orderBy(desc("n"), asc("l_returnflag")).collect()
      assert(rows.toSeq == expected.toSeq)
    } finally spark.conf.set("spark.graft.tinySort.enabled", "true")
    }
  }

  test("kill switch restores the range-partitioned global sort") {
    withoutTinyAgg {
    spark.conf.set("spark.graft.tinySort.enabled", "false")
    try {
      val df = ops.table(spark, sf0001, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("l_returnflag"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("rangepartitioning"))
    } finally spark.conf.set("spark.graft.tinySort.enabled", "true")
    }
  }
}
