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
