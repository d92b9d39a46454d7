package graft.tools
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SessionDefaults.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id * 2 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[calib] median ${ts(1)}%.3f s")
    // flagship final adaptive plan (collect on the SAME QueryExecution so
    // the printed plan reflects the runtime rewrites)
    val df = graft.SparkEntry.queries("q_scan_flagship")(spark, "/root/testdata/sf0.1")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(5000))
    spark.stop()
  }
}
