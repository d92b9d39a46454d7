package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10×/100× scale stress: derives a ~sf1 (or ~sf10) dataset from sf0.1
  * by unioning K key-shifted copies into /tmp parquet, then times the
  * heaviest queries on it. Validates that plan shapes (broadcasts, LSH
  * banding, window shuffles) hold one-two orders of magnitude above the
  * bench scale — the "would this survive a scale-up" check, run rather
  * than asserted. Reports the PEAK cached-storage footprint across each
  * query (sampled concurrently), so the iterative family's
  * checkpoint-release discipline is measured, not assumed.
  * Usage: runMain graft.tools.ScaleStress [copies] [srcSf] [q1,q2,...] */
object ScaleStress {

  def main(args: Array[String]): Unit = {
    val copies = if (args.nonEmpty) args(0).toInt else 10
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$copies"
    // engine session config (incl. injected optimizer rules — the auto
    // range join must rewrite here too), with wider shuffles for 10×
    val spark = graft.SessionDefaults.builder("32")
      .config("spark.sql.shuffle.partitions", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def shifted(name: String, keyCols: Map[String, Long]): DataFrame = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map { i =>
        keyCols.foldLeft(base) { case (df, (c, stride)) =>
          df.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionAll _)
    }

    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      val strideL = 10000000L
      Seq(
        "lineitem" -> shifted("lineitem", Map("l_orderkey" -> strideL)),
        "orders" -> shifted("orders", Map("o_orderkey" -> strideL)),
        "customer" -> shifted("customer", Map("c_custkey" -> strideL)),
        "supplier" -> shifted("supplier", Map("s_suppkey" -> strideL)),
        "part" -> shifted("part", Map("p_partkey" -> strideL)),
        "events" -> shifted("events", Map("event_id" -> strideL,
                                          "user_id" -> 1000L)),
        "documents" -> shifted("documents", Map("doc_id" -> strideL)),
        "embeddings" -> shifted("embeddings", Map("vec_id" -> strideL)),
        "region" -> spark.read.parquet(s"$src/region.parquet"),
        "nation" -> spark.read.parquet(s"$src/nation.parquet"),
      ).foreach { case (name, df) =>
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[stress] wrote $name")
      }
    }

    val defaultHeavy = Seq("q_scan_flagship", "q_agg_groupby", "q_join_inner",
      "q_window_rank", "q_sessionize", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_ngram", "q_sim_search", "q_sim_search_lsh", "q_topk",
      "q_dedup_clusters", "q_session_window", "q_agg_stats",
      "q_window_range_frame",
      // round-3 additions with non-trivial scale shapes
      "q_dedup_embed", "q_dedup_ngram_capped", "q_join_range",
      "q_join_range_auto",
      "q_merge_upsert", "q_zorder", "q_tpch_q3", "q_tpch_q5",
      "q_sample_stratified", "q_graph_degree",
      // round-13: the content-contracted clustering pair — the two
      // queries whose 100× posture the contraction rewrote
      "q_dedup_minhash_clusters", "q_dedup_multi_signal")
    val heavy =
      if (args.length > 2) args(2).split(",").toSeq else defaultHeavy
    // Peak cached-storage sampler: the iterative queries persist /
    // localCheckpoint per round and RELEASE finished rounds — the peak
    // (not the after-query residual) is what bounds executor memory.
    @volatile var peakStorage = 0L
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val cur = try spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum
        catch { case _: Exception => 0L }
        if (cur > peakStorage) peakStorage = cur
        Thread.sleep(200)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    heavy.foreach { name =>
      val t0 = System.nanoTime()
      peakStorage = 0L
      try {
        val c = graft.SparkEntry.queries(name)(spark, out).count()
        println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"($c rows, peak cached ${peakStorage / 1048576.0}%.0f MiB)")
      } catch { case e: Throwable =>
        println(s"[stress] $name FAILED: ${e.getMessage.take(120)}")
      }
      graft.ops.DedupOps.clearPairsCache()
      graft.ops.GraphOps.clearMessageCache()
      spark.catalog.clearCache()
    }
    sampling = false
    spark.stop()
  }
}
