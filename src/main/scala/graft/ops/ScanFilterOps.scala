package graft.ops

import org.apache.spark.sql.functions._

/** Scans, filters, projections (SURVEY.md §2.1 A1–A10, §2.3).
  *
  * `q_scan_flagship` re-expresses the reference's single query template
  * (reference runner.cc:174–182): conjunctive open-interval range filter on
  * three double columns → hash aggregate grouped on one integer key →
  * min/min/min/min/avg → ORDER BY the avg alias NULLS LAST (DuckDB's default
  * null order, reference runner.cc:179), retargeted at the driver's lineitem
  * table. Catalyst pushes the range predicates and the 5-column projection
  * into the parquet scan (verified via explain: PushedFilters / ReadSchema),
  * which is the property the reference's read-byte accounting exists to
  * demonstrate (reference runner.cc:109–117, README.md:90).
  */
object ScanFilterOps {

  val queries: Map[String, QB] = Map(
    "q_scan_count" -> ((s, d) =>
      table(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    "q_scan_flagship" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(col("l_quantity") > 10 && col("l_quantity") < 20 &&
                col("l_discount") > 0.02 && col("l_discount") < 0.08 &&
                col("l_tax") > 0.01 && col("l_tax") < 0.07)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_orderkey")).as("vid"),
             min(col("l_quantity")).as("x"),
             min(col("l_discount")).as("y"),
             min(col("l_tax")).as("z"),
             r6(davg(col("l_extendedprice"))).as("e"))
        .select("vid", "x", "y", "z", "e")
        .orderBy(asc_nulls_last("e"), col("vid"))),

    "q_filter_range" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(col("l_quantity") > 5 && col("l_quantity") < 45 &&
                col("l_discount") > 0.01 && col("l_discount") < 0.09 &&
                col("l_extendedprice") > 1000 && col("l_extendedprice") < 50000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in the generated data —
        // order over the full output tuple so ties are indistinguishable.
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice")),

    "q_filter_in_like_null" -> ((s, d) =>
      table(s, d, "customer")
        .filter(col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE") &&
                col("c_name").like("%1%") &&
                col("c_acctbal").isNotNull &&
                (col("c_acctbal") > 5000.0 || col("c_acctbal") < 0.0))
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
        .orderBy("c_custkey")),

    // Deterministic modulo sampling — the cross-engine-exact way to sample
    // (key-hash/mod), oracle-matched.
    "q_sample_mod" -> ((s, d) =>
      table(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(100)) === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // Bernoulli sampling with a fixed seed — engine-specific RNG, so
    // rows-only check (no oracle); deterministic within Spark.
    "q_sample_seeded" -> ((s, d) =>
      table(s, d, "lineitem")
        .sample(withReplacement = false, fraction = 0.01, seed = 42L)
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")),

    // Null-handling scalar ops (nulls introduced via nullif so the
    // nullless test data still exercises them).
    "q_null_funcs" -> ((s, d) =>
      table(s, d, "customer")
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
                   lit("REDACTED")).as("seg_filled"),
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal_pos"),
          isnull(when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal"))).as("bal_was_neg"))
        .orderBy("c_custkey")),

    "q_project_exprs" -> ((s, d) =>
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(col("l_extendedprice") * (lit(1) - col("l_discount")) *
             (lit(1) + col("l_tax"))).as("net"),
          when(col("l_quantity") < 10, "small")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("big").as("bucket"))
        .orderBy("l_orderkey", "l_linenumber", "net", "bucket")),

    // Scalar subquery in a filter (orders above the global mean price):
    // the aggregate collapses to one row, broadcast-cross-joined against
    // the fact scan — one pass over the data plus a single-row exchange,
    // the decorrelated plan every engine wants. The mean is the exact
    // decimal-sum average (raw avg(double) is accumulation-order-
    // dependent and would flip rows at the boundary).
    "q_subquery_scalar" -> ((s, d) => {
      val o = table(s, d, "orders")
      val avgP = o.agg(davg(col("o_totalprice")).as("avg_p"))
      o.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("avg_p"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_scan_count" -> "SELECT count(*) AS n FROM lineitem",

    // Golden pin (not a derivation — see GoldenOracles): the exact
    // seed-42 sample Spark produces on the sf0.01 driver fixture.
    "q_sample_seeded" -> GoldenOracles.sampleSeededSql,

    "q_scan_flagship" -> """
      SELECT min(l_orderkey) AS vid, min(l_quantity) AS x,
             min(l_discount) AS y, min(l_tax) AS z,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / count(l_extendedprice), 6) AS e
      FROM lineitem
      WHERE l_quantity > 10 AND l_quantity < 20
        AND l_discount > 0.02 AND l_discount < 0.08
        AND l_tax > 0.01 AND l_tax < 0.07
      GROUP BY l_orderkey
      ORDER BY e NULLS LAST, vid""",

    "q_filter_range" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity > 5 AND l_quantity < 45
        AND l_discount > 0.01 AND l_discount < 0.09
        AND l_extendedprice > 1000 AND l_extendedprice < 50000
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""",

    "q_filter_in_like_null" -> """
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'FURNITURE')
        AND c_name LIKE '%1%'
        AND c_acctbal IS NOT NULL
        AND (c_acctbal > 5000.0 OR c_acctbal < 0.0)
      ORDER BY c_custkey""",

    "q_sample_mod" -> """
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      WHERE l_orderkey % 100 = 0
      ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_null_funcs" -> """
      SELECT c_custkey,
             nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED')
               AS seg_filled,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos,
             (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL)
               AS bal_was_neg
      FROM customer
      ORDER BY c_custkey""",

    "q_project_exprs" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net,
             CASE WHEN l_quantity < 10 THEN 'small'
                  WHEN l_quantity < 30 THEN 'mid'
                  ELSE 'big' END AS bucket
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, net, bucket""",

    "q_subquery_scalar" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_totalprice > (
        SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               / count(*)
        FROM orders)
      ORDER BY o_orderkey""",
  )
}
