package graft.io

import org.apache.spark.sql.DataFrame

/** Output-side scale posture (SURVEY.md §2.3 sinks row — the reference's
  * sink is its result stream; a 100 TB pipeline's sink is laid-out
  * parquet):
  *
  *   - partitioned parquet: directory-partition the output on a low-
  *     cardinality column so downstream readers prune partitions at plan
  *     time (a `lang='en'` read touches 1/n_langs of the data);
  *   - bucketed tables: pre-shuffle the data into a fixed number of
  *     buckets on the join key so repeated joins/aggregations on that key
  *     run with NO exchange — the shuffle is paid once at write time, not
  *     per query. This is the classic warehouse layout for fact tables
  *     that join each other on the same key every day.
  *
  * Both are thin, deliberate wrappers (the value is the documented,
  * tested contract — SinksSpec asserts partition pruning and the
  * exchange-free join plan, not just that files appear).
  */
object Sinks {

  /** Write `df` as parquet directory-partitioned by `cols` (Hive-style
    * `col=value` directories, readable by any parquet reader). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(path)

  /** Save `df` as a bucketed, in-bucket-sorted parquet table (catalog
    * table `name`): `buckets` buckets hashed on `key`. Joins and
    * aggregations keyed on `key` between tables bucketed the same way
    * plan without an Exchange. */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    key: String): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(name)

  /** Write `df` as ORC, optionally directory-partitioned — the export
    * path toward Hive-ecosystem consumers (same pruning story as the
    * parquet sink; ORC stripes carry min/max indexes so downstream
    * predicate pushdown works). */
  def writeOrc(df: DataFrame, path: String, partitionCols: String*): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  /** Compact a FLAT parquet directory into ~`targetFileBytes` files (the
    * small-files cure: a streaming or per-task writer leaves thousands of
    * KB-scale files whose open/footer cost dominates reads at scale).
    * Target count is derived from the actual on-disk byte size; written
    * to `dest` then the caller swaps directories (never compact in place
    * — a failed overwrite of the source would lose data). Returns the
    * number of parquet files actually written (empty partitions produce
    * no file, so this can be below the planned count).
    *
    * Refuses Hive-partitioned input (`col=value` subdirectories): a flat
    * rewrite would silently flatten the partition columns into the data
    * files with inferred types and lose pruning — compact each partition
    * directory individually instead. */
  def compact(spark: org.apache.spark.sql.SparkSession, src: String,
              dest: String, targetFileBytes: Long = 128L << 20): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(src), conf)
    // Enforce the "never compact in place" contract: an overwrite write
    // into, under, or ABOVE the directory being read deletes the source
    // before the scan completes — the exact data-loss mode the doc warns
    // about (a dest that is an ancestor of src is recursively cleared by
    // mode("overwrite") and takes src with it). Compare fully-qualified
    // URIs (scheme + authority + path): equal bare paths on different
    // filesystems are legitimately distinct locations. URI.normalize()
    // folds '.'/'..' segments (Hadoop Path keeps them verbatim), so
    // "/data/x/../tbl" can't slip past the prefix check; symlink aliasing
    // is beyond a path-level guard and stays the caller's responsibility.
    val srcQ =
      fs.makeQualified(srcPath).toUri.normalize().toString.stripSuffix("/")
    val destQ = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(dest), conf)
      .makeQualified(new org.apache.hadoop.fs.Path(dest))
      .toUri.normalize().toString.stripSuffix("/")
    require(destQ != srcQ && !destQ.startsWith(srcQ + "/") &&
            !srcQ.startsWith(destQ + "/"),
      s"compact: dest $dest overlaps the source directory (same, nested, " +
        "or ancestor); compacting in place would overwrite the data " +
        "being read")
    val partitionDirs = fs.listStatus(srcPath)
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.contains("="))
    require(partitionDirs.isEmpty,
      s"compact: $src is Hive-partitioned (${partitionDirs.take(3).mkString(", ")}…); " +
        "compact each partition directory individually to keep the layout")
    val bytes = fs.getContentSummary(srcPath).getLength
    val nFiles = math.max(1, math.ceil(
      bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(src).repartition(nFiles)
      .write.mode("overwrite").parquet(dest)
    val destFs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dest), conf)
    destFs.listStatus(new org.apache.hadoop.fs.Path(dest))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }
}
