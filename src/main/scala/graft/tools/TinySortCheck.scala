package graft.tools

/** Audit + interleaved A/B for plans.TinySortSingularize: confirms the
  * runtime rewrite fires on the flagship (no range partitioning in the
  * final plan), that its output is bit-identical to the range-sorted
  * output, and reports interleaved on/off medians (interleaving cancels
  * the JIT/page-cache order drift that sequential combo harnesses see).
  * Usage: runMain graft.tools.TinySortCheck [sfDir] [pairs] */
object TinySortCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pairs = if (args.length > 1) args(1).toInt else 9
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries("q_scan_flagship")
    val df = fn(spark, sfDir)
    val rows = df.collect()
    // executedPlan only reflects the adaptive rewrite AFTER an execution
    // on this same QueryExecution (collect above) — a .write would plan
    // its own QueryExecution and leave this one showing the initial plan.
    // toString on an AdaptiveSparkPlan prints the Final AND Initial plans;
    // the initial section always carries the range exchange, so scope the
    // check to the final-plan section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println("[tiny] rangepartitioning in final plan: " +
      plan.contains("rangepartitioning"))
    spark.conf.set("spark.graft.tinySort.enabled", "false")
    val rows2 = fn(spark, sfDir).collect()
    spark.conf.set("spark.graft.tinySort.enabled", "true")
    println("[tiny] output identical to range-sorted: " +
      rows.toSeq.equals(rows2.toSeq) + s" (${rows.length} rows)")
    def once(on: Boolean): Double = {
      spark.conf.set("spark.graft.tinySort.enabled", on.toString)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 4).foreach { _ => once(true); once(false) }
    val ts = (1 to pairs).map(_ => (once(true), once(false)))
    val on = ts.map(_._1).sorted
    val off = ts.map(_._2).sorted
    println(f"[tiny] ON median ${on(on.size / 2)}%.3f s  " +
      f"OFF median ${off(off.size / 2)}%.3f s  (n=$pairs interleaved)")
    spark.stop()
  }
}
