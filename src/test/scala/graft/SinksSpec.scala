package graft

import org.apache.spark.sql.functions._

import graft.io.Sinks

/** The sink contracts are plan properties, not just files-on-disk:
  * partitioned output must prune partitions at read, bucketed tables must
  * join without an Exchange. */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    Sinks.writePartitioned(docs, dir, "lang")
    val langs = docs.select("lang").distinct().as[String].collect()
    assert(langs.length > 1, "fixture needs several languages")
    val one = spark.read.parquet(dir).filter($"lang" === langs.head)
    // partition filter, not a data filter: the scan lists only lang=<x>
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"), scan.take(400))
    assert(scan.contains("lang"), scan.take(400))
    assert(one.count() ==
      docs.filter($"lang" === langs.head).count())
    // full read returns everything (round trip intact)
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("bucketed tables join and aggregate with no exchange") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val or = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(li, "li_b", 8, "l_orderkey")
    Sinks.writeBucketed(or, "or_b", 8, "o_orderkey")
    // at sf0.001 the planner would just broadcast the tiny side (which
    // bypasses buckets); disable broadcast to expose the co-located plan
    // that a fact-fact join at real scale would take
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // co-located join: both sides pre-bucketed on the key → SMJ reads
      // buckets directly, no shuffle on either side
      val j = spark.table("li_b")
        .join(spark.table("or_b"), $"l_orderkey" === $"o_orderkey")
      val jPlan = planOf(j)
      assert(jPlan.contains("SortMergeJoin") ||
             jPlan.contains("ShuffledHashJoin"), jPlan.take(600))
      assert(!jPlan.contains("Exchange"), jPlan.take(600))
      assert(j.count() ==
        li.join(or, $"l_orderkey" === $"o_orderkey").count())
      // bucket-keyed aggregation also skips the exchange
      val a = spark.table("li_b").groupBy($"l_orderkey")
        .agg(sum($"l_quantity"))
      assert(!planOf(a).contains("Exchange"), planOf(a).take(600))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }
}
