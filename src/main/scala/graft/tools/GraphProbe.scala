package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** One-off triage for q_graph_pagerank's warm cost (VERDICT r17 task 4):
  * counts jobs/stages/tasks per run and A/Bs AQE on/off — the suspected
  * cost is scheduling overhead (one AQE job per exchange per round), not
  * data volume. Throwaway diagnostics, not part of the library. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.SessionDefaults.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += s.stageInfo.numTasks
      }
    })
    val fn = graft.SparkEntry.queries("q_graph_pagerank")
    def run(label: String, clear: Boolean = false): Unit =
      (1 to 3).foreach { i =>
      jobs = 0; stages = 0; tasks = 0
      if (clear) graft.ops.GraphOps.clearMessageCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat before reading counters
      Thread.sleep(300)
      println(f"[graph-probe] $label run $i: $dt%.3f s " +
        s"jobs=$jobs stages=$stages tasks=$tasks")
    }
    // warm the base (charged to the first run)
    run("aqe-on ")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    run("aqe-off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    run("aqe-on-8p")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // the bench-realistic row: the message base is rebuilt per warm pass
    run("bench-row", clear = true)
    // ---- variants: replicate base+query with scoped AQE / checkpoints
    import org.apache.spark.sql.functions._
    def buildBase(): org.apache.spark.sql.DataFrame = {
      val Off = 1000000000000L
      val e0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_partkey").as("src"),
                (col("l_suppkey") + Off).as("dst"))
        .distinct().persist()
      val sym = e0.unionAll(e0.select(col("dst").as("src"),
                                      col("src").as("dst")))
      val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val base = sym.join(deg, "src").persist()
      base.count()
      e0.unpersist()
      base
    }
    def variant(label: String, baseAqe: Boolean, qAqe: Boolean,
                cpRounds: Boolean): Unit = (1 to 3).foreach { i =>
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      spark.conf.set("spark.sql.adaptive.enabled", baseAqe.toString)
      val base = buildBase()
      val tBase = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.adaptive.enabled", qAqe.toString)
      var pr = base.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L))
      for (_ <- 1 to 3) {
        pr = base.join(pr.hint("shuffle_hash"), col("src") === col("node"))
          .select(col("dst"), expr("pr DIV outdeg").as("c"))
          .groupBy(col("dst"))
          .agg(expr("150000 + (85 * sum(c)) DIV 100").as("pr"))
          .select(col("dst").as("node"), col("pr"))
        if (cpRounds) pr = pr.localCheckpoint(true)
      }
      pr.select(col("node").as("node_id"), col("pr").as("pr_micro"))
        .orderBy("node_id")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      base.unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      Thread.sleep(300)
      println(f"[graph-probe] $label run $i: $dt%.3f s " +
        f"(base $tBase%.3f) jobs=$jobs stages=$stages tasks=$tasks")
    }
    // collect_set spelling: degrees come free from the per-node set
    // (outdeg = size), no degree join, map-side-combined aggs; one
    // explicit repartition(src) restores the partitioning the rounds'
    // shuffle_hash join builds against
    def buildBaseSet(aqe: Boolean): org.apache.spark.sql.DataFrame = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val Off = 1000000000000L
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_partkey").as("p"), (col("l_suppkey") + Off).as("s"))
      def half(a: String, b: String) =
        li.groupBy(col(a)).agg(collect_set(col(b)).as("nb"))
          .select(col(a).as("src"), explode(col("nb")).as("dst"),
                  size(col("nb")).cast("long").as("outdeg"))
      val base = half("p", "s").unionAll(half("s", "p"))
        .repartition(32, col("src")).persist()
      base.count()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      base
    }
    def variantSet(label: String, aqe: Boolean): Unit = (1 to 3).foreach { i =>
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      val base = buildBaseSet(aqe)
      val tBase = (System.nanoTime() - t0) / 1e9
      var pr = base.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L))
      for (_ <- 1 to 3) {
        pr = base.join(pr.hint("shuffle_hash"), col("src") === col("node"))
          .select(col("dst"), expr("pr DIV outdeg").as("c"))
          .groupBy(col("dst"))
          .agg(expr("150000 + (85 * sum(c)) DIV 100").as("pr"))
          .select(col("dst").as("node"), col("pr"))
      }
      pr.select(col("node").as("node_id"), col("pr").as("pr_micro"))
        .orderBy("node_id")
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      base.unpersist()
      Thread.sleep(300)
      println(f"[graph-probe] $label run $i: $dt%.3f s " +
        f"(base $tBase%.3f) jobs=$jobs stages=$stages tasks=$tasks")
    }
    variantSet("v-setagg-noaqe ", aqe = false)
    variantSet("v-setagg-aqe   ", aqe = true)
    variant("v-base-noaqe   ", baseAqe = false, qAqe = true, cpRounds = false)
    variant("v-all-noaqe    ", baseAqe = false, qAqe = false, cpRounds = false)
    variant("v-cp-rounds    ", baseAqe = false, qAqe = true, cpRounds = true)
    variant("v-current-ish  ", baseAqe = true, qAqe = true, cpRounds = false)
    spark.stop()
  }
}
