package graft

import org.apache.spark.sql.functions._

/** Laws for the warehouse-maintenance operators beyond the oracle
  * hash-match: semantic partitions of the merge output, binned-range-join
  * equivalence to the naive theta join, z-order invertibility + locality,
  * and sampling determinism. */
class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  test("merge actions partition the keyspace as the change feed dictates") {
    val out = ops.WarehouseOps.queries("q_merge_upsert")(spark, sf0001)
    val byAction = out.groupBy("action").count()
      .as[(String, Long)].collect().toMap
    val orders = ops.table(spark, sf0001, "orders")
    val nUpd = orders.filter($"o_orderkey" % 10 === 7).count()
    val nIns = orders.filter($"o_orderkey" % 10 === 3).count()
    val nAll = orders.count()
    assert(byAction("update") == nUpd)
    assert(byAction("insert") == nIns)
    assert(byAction("keep") == nAll - nUpd)
    // inserts land on fresh keys: total = table + inserts, no collisions
    assert(out.count() == nAll + nIns)
  }

  test("binned range join equals the naive theta join") {
    // The binning is a pure execution-strategy rewrite — same result as
    // the O(n·m) nested-loop formulation it replaces.
    val binned = ops.WarehouseOps.queries("q_join_range")(spark, sf0001)
      .collect().toSeq
    val iv = ops.table(spark, sf0001, "orders")
      .filter($"o_orderkey" % 997 === 0)
      .select($"o_orderkey", to_date($"o_orderdate").as("d0"))
    val pt = ops.table(spark, sf0001, "lineitem")
      .select(to_date($"l_shipdate").as("sd"), $"l_quantity")
    val naive = iv.join(pt,
        $"sd" >= $"d0" && $"sd" <= date_add($"d0", 3), "left")
      .groupBy($"o_orderkey", $"d0".as("win_start"))
      .agg(count($"sd").as("n_items"),
        coalesce(sum($"l_quantity".cast("decimal(18,6)")),
                 lit(0).cast("decimal(18,6)"))
          .cast("double").as("sum_qty"))
      .orderBy("o_orderkey").collect().toSeq
    assert(binned == naive)
  }

  test("z-order interleave is invertible and clusters both dimensions") {
    // Invertibility: de-interleaving the odd/even bits recovers (x, y) —
    // the encoding loses nothing, so sorting by it is a total order on
    // the pair.
    val pts = (0 until 1024 by 7).flatMap(x =>
      (0 until 1024 by 13).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val z = pts.withColumn("zval", expr(
      """aggregate(sequence(0, 9), CAST(0 AS BIGINT), (acc, j) ->
           acc + shiftleft(shiftright(x, j) & 1, 2 * j)
               + shiftleft(shiftright(y, j) & 1, 2 * j + 1))"""))
    val bad = z.withColumn("x2", expr(
        """aggregate(sequence(0, 9), CAST(0 AS BIGINT), (acc, j) ->
             acc + shiftleft(shiftright(zval, 2 * j) & 1, j))"""))
      .withColumn("y2", expr(
        """aggregate(sequence(0, 9), CAST(0 AS BIGINT), (acc, j) ->
             acc + shiftleft(shiftright(zval, 2 * j + 1) & 1, j))"""))
      .filter($"x" =!= $"x2" || $"y" =!= $"y2").count()
    assert(bad == 0L)
    // Locality: split the z-sorted points into 16 chunks; every chunk's
    // (x, y) bounding box must cover far less than the full domain —
    // that per-chunk envelope is exactly what parquet min/max skipping
    // prunes on. A single-column sort leaves the other column's range
    // at full width; z-order bounds both.
    val chunks = z.orderBy("zval")
      .withColumn("chunk", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy("zval")))
      .groupBy("chunk")
      .agg(((max($"x") - min($"x")) * (max($"y") - min($"y")))
        .as("bbox_area"))
      .agg(avg($"bbox_area")).as[Double].head()
    val fullArea = 1023.0 * 1023.0
    assert(chunks < fullArea / 4,
      s"mean z-chunk bbox $chunks not < ${fullArea / 4}")
  }

  test("stratified sample is deterministic and near the target rates") {
    val q = ops.WarehouseOps.queries("q_sample_stratified")
    val a = q(spark, sf0001).collect().toSeq
    val b = q(spark, sf0001).collect().toSeq
    assert(a == b)
    a.foreach { r =>
      val (flag, rate) = (r.getString(0), r.getDouble(3))
      val target = flag match {
        case "A" => 0.10; case "N" => 0.05; case _ => 0.20
      }
      assert(math.abs(rate - target) < 0.05,
        s"stratum $flag observed $rate, target $target")
    }
  }

  test("binned range join: empty interval side yields empty output, no error") {
    val iv = ops.table(spark, sf0001, "orders")
      .filter($"o_orderkey" < 0) // empty
      .select($"o_orderkey", to_date($"o_orderdate").as("d0"))
    val pt = ops.table(spark, sf0001, "lineitem")
      .select(to_date($"l_shipdate").as("sd"))
    val out = iv.join(pt,
      $"sd" >= $"d0" && $"sd" <= date_add($"d0", 3))
    // the optimizer rule must still fire and still return nothing
    assert(out.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    assert(out.count() == 0L)
  }

  test("merge with an empty change feed keeps the table unchanged") {
    val o = ops.table(spark, sf0001, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice".as("tprice"))
    val src = o.filter($"k" < 0)
      .select($"k", $"tprice".as("sprice"))
    val merged = o.as("t").join(src.as("s"), $"t.k" === $"s.k", "full_outer")
      .select(coalesce($"t.k", $"s.k").as("k"),
        coalesce($"sprice", $"tprice").as("price"))
    assert(merged.count() == o.count())
    assert(merged.filter($"price".isNull).count() == 0L)
  }

  test("snapshot diff: keeping both snapshots equal yields an empty diff") {
    val o = ops.table(spark, sf0001, "orders")
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"))
    val diff = o.as("o").join(o.as("n"), $"o.k" === $"n.k", "full_outer")
      .filter($"o.k".isNull || $"n.k".isNull || $"o.price" =!= $"n.price")
    assert(diff.count() == 0L)
  }
}
