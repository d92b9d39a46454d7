package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition for the flagship: times progressively larger
  * sub-plans to locate warm-time overhead (scan vs agg exchange vs sort).
  * Usage: runMain graft.tools.FlagshipStages [sfDir] [n] */
object FlagshipStages {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults.builder(cpus).getOrCreate()
    import graft.ops.{davg, r6, table}
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def base = table(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 10 && col("l_quantity") < 20 &&
              col("l_discount") > 0.02 && col("l_discount") < 0.08 &&
              col("l_tax") > 0.01 && col("l_tax") < 0.07)
    def grouped = base.groupBy(col("l_orderkey"))
      .agg(min(col("l_orderkey")).as("vid"),
           min(col("l_quantity")).as("x"),
           min(col("l_discount")).as("y"),
           min(col("l_tax")).as("z"),
           r6(davg(col("l_extendedprice"))).as("e"))
      .select("vid", "x", "y", "z", "e")
    val subs: Seq[(String, () => Unit)] = Seq(
      "scan_filter_count" -> (() => { base.agg(count(lit(1))).collect(); () }),
      "scan_5col_globalagg" -> (() => {
        base.agg(min("l_quantity"), min("l_discount"), min("l_tax"),
                 avg("l_extendedprice")).collect(); () }),
      "grouped_agg_noop" -> (() => grouped
        .write.format("noop").mode("overwrite").save()),
      "full_with_sort" -> (() => grouped
        .orderBy(asc_nulls_last("e"), col("vid"))
        .write.format("noop").mode("overwrite").save()),
    )
    // burn-in
    subs.foreach { case (_, f) => f(); f() }
    subs.foreach { case (label, f) =>
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[stage] $label%-22s median ${ts(ts.size / 2)}%.3f s  " +
        f"min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
    spark.stop()
  }
}
