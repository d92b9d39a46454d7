package graft

import org.apache.spark.sql.functions._

/** plans.TinyAggSingularize: an aggregate over an exact-size-tiny file
  * scan is pinned to one partition, so the partial→final agg exchange
  * (and any downstream sort exchange) disappears — identical rows. */
class TinyAggSpec extends SparkTestBase {
  import spark.implicits._

  private def flagshipish = ops.table(spark, sf0001, "lineitem")
    .filter($"l_quantity" > 10 && $"l_quantity" < 20)
    .groupBy($"l_orderkey")
    .agg(min($"l_quantity").as("x"), ops.davg($"l_extendedprice").as("e"))
    .orderBy(asc_nulls_last("e"), $"l_orderkey")

  test("tiny-scan aggregate plans with no exchange at all") {
    val df = flagshipish
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!finalPlan.contains("Exchange"),
      s"tiny-scan agg kept an exchange:\n$finalPlan")
    assert(finalPlan.contains("Coalesce"),
      s"expected the singularizing Coalesce:\n$finalPlan")
  }

  test("rewrite is bit-identical to the exchange plan") {
    val got = flagshipish.collect()
    spark.conf.set("spark.graft.tinyAgg.enabled", "false")
    try {
      val expected = flagshipish.collect()
      assert(got.toSeq == expected.toSeq)
    } finally spark.conf.set("spark.graft.tinyAgg.enabled", "true")
  }

  test("kill switch restores the hash exchange") {
    spark.conf.set("spark.graft.tinyAgg.enabled", "false")
    try {
      val df = ops.table(spark, sf0001, "lineitem")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.graft.tinyAgg.enabled", "true")
  }

  test("does not fire above the size threshold") {
    spark.conf.set("spark.graft.tinyAgg.maxBytes", "1")
    try {
      val df = ops.table(spark, sf0001, "lineitem")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.unset("spark.graft.tinyAgg.maxBytes")
  }

  test("does not fire when the aggregate input is a join") {
    val l = ops.table(spark, sf0001, "lineitem")
    val o = ops.table(spark, sf0001, "orders")
    val df = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Repartition"),
      s"rule fired through a join:\n$optimized")
  }
}
