package graft.ops

import org.apache.spark.sql.functions._

/** Sorts, top-k, set operations (SURVEY.md §2.3).
  *
  * Null ordering is spelled explicitly everywhere (Spark's bare asc is
  * NULLS FIRST, DuckDB's is NULLS LAST). `q_topk` plans as
  * TakeOrderedAndProjectExec — per-partition heaps + driver merge, no global
  * sort, which is the right top-k shape at 100 TB.
  */
object SortSetOps {

  val queries: Map[String, QB] = Map(
    "q_sort_multi" -> ((s, d) =>
      table(s, d, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(asc_nulls_last("s_nationkey"), desc_nulls_last("s_acctbal"),
                 asc("s_suppkey"))),

    "q_topk" -> ((s, d) =>
      table(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    // UNION (distinct) of two filtered projections.
    "q_set_union" -> ((s, d) =>
      table(s, d, "customer").filter(col("c_acctbal") > 0)
        .select(col("c_nationkey").as("nk"))
        .union(table(s, d, "supplier").filter(col("s_acctbal") > 0)
          .select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk")),

    // UNION ALL preserved via group-count over the concatenation.
    "q_set_union_all" -> ((s, d) =>
      table(s, d, "customer").select(col("c_nationkey").as("nk"))
        .unionAll(table(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("n"))
        .orderBy("nk")),

    "q_set_intersect" -> ((s, d) =>
      table(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(table(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk")),

    "q_set_except" -> ((s, d) => {
      import s.implicits._
      table(s, d, "customer").select(col("c_mktsegment").as("seg")).distinct()
        .except(Seq("AUTOMOBILE", "BUILDING").toDF("seg"))
        .orderBy("seg")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_sort_multi" -> """
      SELECT s_suppkey, s_nationkey, s_acctbal
      FROM supplier
      ORDER BY s_nationkey ASC NULLS LAST, s_acctbal DESC NULLS LAST,
               s_suppkey ASC""",

    "q_topk" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10""",

    "q_set_union" -> """
      SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 0
        UNION
        SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 0)
      ORDER BY nk""",

    "q_set_union_all" -> """
      SELECT nk, count(*) AS n FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION ALL
        SELECT s_nationkey AS nk FROM supplier)
      GROUP BY nk
      ORDER BY nk""",

    "q_set_intersect" -> """
      SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier)
      ORDER BY nk""",

    "q_set_except" -> """
      SELECT seg FROM (
        SELECT DISTINCT c_mktsegment AS seg FROM customer
        EXCEPT
        SELECT * FROM (VALUES ('AUTOMOBILE'), ('BUILDING')) v(seg))
      ORDER BY seg""",
  )
}
