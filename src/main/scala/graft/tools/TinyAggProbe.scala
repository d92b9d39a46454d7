package graft.tools

import org.apache.spark.sql.functions._

/** A/B probe for the tiny-relation aggregate: current plan (partial agg →
  * exchange → final agg) vs a coalesce(1) complete aggregate, interleaved,
  * to size the win of dropping the exchange when the scan is one split.
  * Usage: runMain graft.tools.TinyAggProbe [sfDir] [n]
  */
object TinyAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults.builder(cpus).getOrCreate()
    import graft.ops.{davg, r6, table}
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def base = table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10 && col("l_quantity") < 20 &&
              col("l_discount") > 0.02 && col("l_discount") < 0.08 &&
              col("l_tax") > 0.01 && col("l_tax") < 0.07)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_orderkey")).as("vid"),
           min(col("l_quantity")).as("x"),
           min(col("l_discount")).as("y"),
           min(col("l_tax")).as("z"),
           r6(davg(col("l_extendedprice"))).as("e"))
      .select("vid", "x", "y", "z", "e")
      .orderBy(asc_nulls_last("e"), col("vid"))
    val variants: Seq[(String, () => Unit)] = Seq(
      "current " -> (() => { agg(base).collect(); () }),
      "coalesce1" -> (() => { agg(base.coalesce(1)).collect(); () }),
    )
    variants.foreach { case (_, f) => f(); f() } // burn-in
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    (1 to n).foreach { _ =>
      variants.foreach { case (label, f) =>
        val t0 = System.nanoTime(); f()
        times(label) ::= (System.nanoTime() - t0) / 1e9
      }
    }
    variants.foreach { case (label, _) =>
      val ts = times(label).sorted
      println(f"[tinyAgg] $label median ${ts(ts.size / 2)}%.3f s  " +
        f"min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
    println("--- coalesce1 plan ---")
    agg(base.coalesce(1)).explain("formatted")
    spark.stop()
  }
}
