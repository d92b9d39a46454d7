package graft.tools

/** Config A/B harness for one query: runs the query N times under each
  * named combination of runtime-settable SQL confs, reporting the median —
  * used to attribute warm-time drift to specific session defaults.
  * Usage: runMain graft.tools.FlagshipTune [query] [sfDir] [n] */
object FlagshipTune {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "q_scan_flagship"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    val combos: Seq[(String, Map[String, String])] = Seq(
      "defaults" -> Map(),
      "tinySortOff" -> Map("spark.graft.tinySort.enabled" -> "false"),
      "split128m+shuffle8" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "128m",
        "spark.sql.shuffle.partitions" -> "8"),
      "split128m+shuffle4" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "128m",
        "spark.sql.shuffle.partitions" -> "4"),
      "split16m" -> Map("spark.sql.files.maxPartitionBytes" -> "16m"),
      "openCost16m" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "128m",
        "spark.sql.files.openCostInBytes" -> "16m"),
      "localShuffleReader" -> Map(
        "spark.sql.files.maxPartitionBytes" -> "128m",
        "spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.localShuffleReader.enabled" -> "true"),
      "defaults_again" -> Map(),
    )
    // Burn-in so JIT state is shared before the first measured combo.
    (1 to 5).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    combos.foreach { case (label, confs) =>
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      saved.foreach { case (k, ov) =>
        ov.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      println(f"[tune] $label%-20s median ${ts(ts.size / 2)}%.3f s  " +
        f"min ${ts.head}%.3f  max ${ts.last}%.3f")
    }
    spark.stop()
  }
}
