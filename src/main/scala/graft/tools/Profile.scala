package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: runs one query N times, prints timings + formatted
  * plan. Usage: runMain graft.tools.Profile <query> [sfDir] [n] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      println(f"[profile] run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    if (sys.env.get("PROFILE_EXPLAIN").contains("1"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
