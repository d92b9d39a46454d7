package graft

/** The user-facing SQL surface: Graft.open registers the dataset, then
  * plain spark.sql works — the reference's "SQL over parquet" workflow. */
class GraftSpec extends SparkTestBase {
  import spark.implicits._

  test("open registers all tables; sql runs the flagship shape") {
    val views = Graft.open(spark, sf0001)
    assert(views.toSet == Graft.tableNames.toSet)
    val n = Graft.sql(spark, "SELECT count(*) AS n FROM lineitem")
      .as[Long].head()
    assert(n == 6000)
    val flagship = Graft.sql(spark, """
      SELECT min(l_orderkey) AS vid, avg(l_extendedprice) AS e
      FROM lineitem
      WHERE l_quantity > 10 AND l_quantity < 20
      GROUP BY l_orderkey ORDER BY e NULLS LAST, vid LIMIT 5""")
    assert(flagship.count() == 5)
  }

  test("sql surface covers subqueries: scalar, correlated EXISTS, IN, CTE") {
    Graft.open(spark, sf0001)
    // scalar subquery (rewritten by Catalyst to a broadcast join)
    val above = Graft.sql(spark, """
      SELECT count(*) AS n FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""")
      .as[Long].head()
    val total = spark.table("orders").count()
    assert(above > 0 && above < total)
    // correlated EXISTS (→ semi join) agrees with the DSL semi join
    val exists = Graft.sql(spark, """
      SELECT count(*) FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")
      .as[Long].head()
    val semi = spark.table("customer").join(spark.table("orders"),
      $"c_custkey" === $"o_custkey", "left_semi").count()
    assert(exists == semi)
    // IN subquery and a CTE in one statement
    val cte = Graft.sql(spark, """
      WITH big AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 100000)
      SELECT count(DISTINCT l_orderkey) FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM big)""").as[Long].head()
    val viaJoin = spark.table("lineitem").join(
      spark.table("orders").filter($"o_totalprice" > 100000),
      $"l_orderkey" === $"o_orderkey", "left_semi")
      .select("l_orderkey").distinct().count()
    assert(cte == viaJoin && cte > 0)
  }

  test("events view has usable microsecond timestamps via ns conversion") {
    Graft.open(spark, sf0001)
    val types = spark.table("events").schema.fields
      .map(f => f.name -> f.dataType.typeName).toMap
    assert(types("ts").startsWith("timestamp"))
    val r = Graft.sql(spark,
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP'2024-01-01 00:00:00'")
      .as[Long].head()
    assert(r > 0)
  }
}
