package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{dsum, r6, table}

/** A/B harness for TPC-H Q17's correlated-average shape: the
  * whole-partition WINDOW over l_partkey (one branded-subset shuffle,
  * one scan) vs the per-part AGGREGATE JOINED BACK to the fact (two
  * scans, agg shuffle, join — broadcast at small scale, shuffle at
  * large). Round 9 shipped the window rewrite on plan rationale and the
  * sf0.1 number went 0.61 → 1.32 s without a measurement; this tool is
  * that measurement. Interleaved warm samples (median of N per shape,
  * alternating) on any fixture dir:
  *
  *   runMain graft.tools.Q17Shapes <dir> [samples]
  */
object Q17Shapes {
  private def windowShape(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = broadcast(table(s, d, "part")
      .filter(col("p_brand") === "Brand#13").select("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    val qlimit =
      (sum(col("l_quantity").cast("decimal(18,6)")).over(w)
         .cast("double") / count(col("l_quantity")).over(w)) * 0.2
    table(s, d, "lineitem")
      .join(dim, col("l_partkey") === col("p_partkey"))
      .withColumn("qlimit", qlimit)
      .filter(col("l_quantity") < col("qlimit"))
      .agg(r6(dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      .orderBy("avg_yearly")
  }

  private def joinBackShape(s: SparkSession, d: String): DataFrame = {
    val dim = broadcast(table(s, d, "part")
      .filter(col("p_brand") === "Brand#13").select("p_partkey"))
    val branded = table(s, d, "lineitem")
      .join(dim, col("l_partkey") === col("p_partkey"))
    val avgq = branded.groupBy(col("l_partkey").as("a_partkey"))
      .agg((sum(col("l_quantity").cast("decimal(18,6)")).cast("double") /
            count(col("l_quantity")) * 0.2).as("qlimit"))
    branded
      .join(avgq, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < col("qlimit"))
      .agg(r6(dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      .orderBy("avg_yearly")
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionDefaults.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(fn: => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // one unmeasured cold pass each, then interleaved warm samples
    time(windowShape(spark, dir)); time(joinBackShape(spark, dir))
    val (ws, js) = (1 to n).map { _ =>
      (time(windowShape(spark, dir)), time(joinBackShape(spark, dir)))
    }.unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    val wRows = windowShape(spark, dir).collect().map(_.toString).toSeq
    val jRows = joinBackShape(spark, dir).collect().map(_.toString).toSeq
    println(f"window   median=${med(ws)}%.3f samples=${ws.map(x => f"$x%.3f").mkString(",")}")
    println(f"joinback median=${med(js)}%.3f samples=${js.map(x => f"$x%.3f").mkString(",")}")
    println(s"results_equal=${wRows == jRows} window=${wRows.mkString(";")} joinback=${jRows.mkString(";")}")
    spark.stop()
  }
}
