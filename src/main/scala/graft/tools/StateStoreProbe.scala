package graft.tools

/** Scratch probe: times a stateful stream query under the default
  * (HDFS-backed COW map) vs RocksDB state store providers on a given
  * fixture. Usage: runMain graft.tools.StateStoreProbe [dir] [query] */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_scale_x100")
    val q = args.lift(1).getOrElse("q_stream_dedup_wm")
    val spark = graft.SessionDefaults.builder("32")
      .config("spark.sql.shuffle.partitions", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the per-query teardown is gated now (ADVICE r17) — this probe's
    // whole point is isolated provider legs, so opt in like every other
    // harness: without it the first leg's providers (COW maps or native
    // RocksDB handles + block caches) stay loaded while the next leg is
    // timed
    spark.conf.set("spark.graft.stream.teardown", "true")
    for (provider <- Seq("default", "rocksdb", "rocksdb")) {
      // The bigState gate inside runStreamN would re-engage RocksDB on a
      // big staging regardless of providerClass — hold its kill switch
      // so each leg measures the provider it names.
      spark.conf.set("spark.graft.stream.rocksdb",
        (provider == "rocksdb").toString)
      if (provider == "rocksdb")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      else spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"[ssp] $q/$provider: ${(System.nanoTime() - t0) / 1e9}%.1f s" +
        f" ($n rows, state=${graft.streaming.StreamOps.takeStateMetrics()})")
    }
    spark.stop()
  }
}
