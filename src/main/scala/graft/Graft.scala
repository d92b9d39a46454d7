package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry point: the reference's UX is "SQL over parquet
  * objects" (reference runner.cc:174–182, README.md:75); this registers the
  * dataset's tables as temp views so the same workflow is one call away:
  *
  * {{{
  *   graft.Graft.open(spark, "/data/sf0.1")
  *   spark.sql("SELECT count(*) FROM lineitem").show()
  * }}}
  */
object Graft {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register every table under `dir` as a temp view (ns-timestamp
    * handling included); tables whose parquet is absent or unreadable are
    * skipped (works for local and remote paths alike). Returns the view
    * names actually registered. */
  def open(spark: SparkSession, dir: String): Seq[String] =
    tableNames.filter { n =>
      try { ops.table(spark, dir, n).createOrReplaceTempView(n); true }
      catch { case _: Exception => false }
    }

  /** SQL passthrough over the registered views. */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
