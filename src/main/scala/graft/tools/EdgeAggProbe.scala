package graft.tools

import org.apache.spark.sql.functions._

/** One-off A/B for the copurchase_edges build (r19): does raising
  * ObjectHashAggregate's sort-based fallback threshold (default 128
  * in-memory groups — the 100× build aggregates 15 M orders, so the
  * default degrades the per-order collect_set into a per-partition
  * corpus SORT) actually buy anything? Alternates the two settings
  * inside ONE JVM so host drift cancels — the cross-JVM ScaleStress
  * A/B was inconclusive under 2× calib swings. Throwaway diagnostics,
  * not part of the library. */
object EdgeAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale_x100"
    val spark = graft.SessionDefaults.builder("32")
      .config("spark.sql.shuffle.partitions", "64")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    def once(label: String, thr: Option[String]): Unit = {
      thr match {
        case Some(v) => spark.conf.set(fbKey, v)
        case None    => spark.conf.unset(fbKey)
      }
      System.gc()
      val t0 = System.nanoTime()
      val n = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .groupBy(col("ok")).agg(array_sort(collect_set(col("p")))
          .as("pss"))
        .select(explode(expr(
          """flatten(transform(pss, (x, i) ->
               transform(slice(pss, i + 2, size(pss)),
                         y -> struct(x AS a, y AS b))))""")).as("e"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[edge-agg] $label: $dt%.2f s ($n edges)")
    }
    for (i <- 1 to 3) {
      once(s"default-$i", None)
      once(s"raised-$i ", Some("16777216"))
    }
    spark.stop()
  }
}
