package graft.runner

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Random, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Metrics

/** CLI-parity runner (SURVEY.md §2.1 A12–A18, §3.1): the reference harness's
  * behavior — per-file parallel query fan-out over parquet objects listed on
  * stdin — re-expressed on Spark.
  *
  * Behavior mirrored from the reference (reference runner.cc:361–395):
  *   - flags `-i` key id, `-k` secret, `-a` s3 address (default 127.0.0.1),
  *     `-p` s3 port (default 9000), `-j` pool threads (default 4);
  *   - data sources on stdin, whitespace-separated, optionally quoted;
  *   - deterministic shuffle of the work list, seed 1 (runner.cc:392);
  *   - one flagship query per file, ≤j concurrently, results to stdout,
  *     stats to stderr so `1>/dev/null` keeps stats (reference README.md:94);
  *   - per-file error isolation: one bad file never aborts the batch
  *     (runner.cc:293–297);
  *   - stderr stat block shaped like runner.cc:343–358.
  *
  * Architectural translation (not a port): the reference runs one fresh
  * single-threaded DuckDB per file on a pthread pool; here one shared
  * SparkSession serves j concurrent driver-side Futures, and Spark's own
  * scheduler parallelizes within each query. S3 access goes through s3a
  * (path-style, plain http — reference runner.cc:205–217). At cluster scale
  * the same binary handles thousands of files: each file-query is an
  * independent job, so executors stay saturated as long as ≥j files remain.
  */
object Main {

  final case class Opts(id: Option[String] = None, key: Option[String] = None,
                        addr: String = "127.0.0.1", port: Int = 9000,
                        threads: Int = 4)

  private def usage(msg: String): Nothing = {
    if (msg.nonEmpty) System.err.println(msg)
    System.err.println("==============")
    System.err.println("usage: graft.runner.Main [options]")
    System.err.println("-i      id           :  s3 access key id")
    System.err.println("-k      key          :  s3 secret access key")
    System.err.println("-a      address      :  s3 web address")
    System.err.println("-p      port         :  s3 port")
    System.err.println("-j      threads      :  num query thread")
    System.err.println("==============")
    sys.exit(1)
  }

  private def parseInt(flag: String, v: String): Int =
    try v.toInt
    catch { case _: NumberFormatException =>
      usage(s"$flag expects a number, got: $v") }

  private[graft] def parse(args: List[String], o: Opts): Opts = args match {
    case Nil => o
    case "-i" :: v :: rest => parse(rest, o.copy(id = Some(v)))
    case "-k" :: v :: rest => parse(rest, o.copy(key = Some(v)))
    case "-a" :: v :: rest => parse(rest, o.copy(addr = v))
    case "-p" :: v :: rest => parse(rest, o.copy(port = parseInt("-p", v)))
    case "-j" :: v :: rest => parse(rest, o.copy(threads = parseInt("-j", v)))
    case other :: _ => usage(s"unknown option: $other")
  }

  /** s3a mapping of the reference's SET statements (runner.cc:205–217) —
    * applied to the session builder and exposed for tests: the sandbox has
    * no S3-compatible endpoint (A2 is config-complete, endpoint-untested;
    * see INVENTORY.md), so the config block is asserted directly while the
    * CLI end-to-end path is driven over local files. */
  private[graft] def s3aConfigs(o: Opts): Seq[(String, String)] =
    Seq(
      "spark.hadoop.fs.s3a.endpoint" -> s"http://${o.addr}:${o.port}",
      "spark.hadoop.fs.s3a.path.style.access" -> "true",
      "spark.hadoop.fs.s3a.connection.ssl.enabled" -> "false") ++
      o.id.map("spark.hadoop.fs.s3a.access.key" -> _) ++
      o.key.map("spark.hadoop.fs.s3a.secret.key" -> _)

  /** The same credential pair on the exercised remote path: ghttp signs
    * every HEAD/ranged-GET with an HMAC Authorization header when these
    * are set (GraftHttpFileSystem.signFor), so `-i/-k` change real request
    * behavior — the reference's flags do exactly that over its HTTP
    * object connection (runner.cc:211–216). */
  private[graft] def ghttpConfigs(o: Opts): Seq[(String, String)] =
    (o.id.map("spark.hadoop.fs.ghttp.auth.id" -> _) ++
     o.key.map("spark.hadoop.fs.ghttp.auth.secret" -> _)).toSeq

  /** The flagship query template (reference runner.cc:174–182) against one
    * parquet source: 6-predicate open-interval filter, group, min×4 + avg,
    * ORDER BY the avg NULLS LAST. Applied to the reference's Laghos schema
    * when present, else retargeted at the testdata lineitem schema. */
  private def flagship(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    if (Set("vertex_id", "x", "y", "z", "e").subsetOf(cols))
      df.filter(col("x") > 1.5 && col("x") < 1.6 &&
                col("y") > 1.5 && col("y") < 1.6 &&
                col("z") > 1.5 && col("z") < 1.6)
        .groupBy(col("vertex_id"))
        .agg(min(col("vertex_id")).as("VID"), min(col("x")).as("X"),
             min(col("y")).as("Y"), min(col("z")).as("Z"),
             avg(col("e")).as("E"))
        .select("VID", "X", "Y", "Z", "E")
        .orderBy(asc_nulls_last("E"))
    else
      df.filter(col("l_quantity") > 10 && col("l_quantity") < 20 &&
                col("l_discount") > 0.02 && col("l_discount") < 0.08 &&
                col("l_tax") > 0.01 && col("l_tax") < 0.07)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_orderkey")).as("VID"), min(col("l_quantity")).as("X"),
             min(col("l_discount")).as("Y"), min(col("l_tax")).as("Z"),
             avg(col("l_extendedprice")).as("E"))
        .select("VID", "X", "Y", "Z", "E")
        .orderBy(asc_nulls_last("E"))
  }

  /** DuckDB physical type name for the chunk print (the reference prints
    * `DataChunk::ToString()`, which names vector types this way). */
  private def duckTypeName(t: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    t match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case StringType => "VARCHAR"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case other => other.sql
    }
  }

  /** Run one file's query; streams result batches to stdout (A11) and
    * returns the hit count. */
  private def runOne(spark: SparkSession, source: String): Long = {
    val path = source.stripPrefix("'").stripSuffix("'")
    val result = flagship(spark.read.parquet(path))
    val fields = result.schema.fields
    var hits = 0L
    val it = result.toLocalIterator()
    // 2048 = DuckDB's STANDARD_VECTOR_SIZE, the reference's chunk size.
    val batch = new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.Row](2048)
    def flush(): Unit = if (batch.nonEmpty) {
      // One columnar chunk per flush, mirroring the reference's
      // chunk-at-a-time print of DataChunk::ToString() (reference
      // runner.cc:219–227; format in reference README.md:78–83): a
      // header line, then one `- FLAT <TYPE>: n = [ v, v, …]` line per
      // column. Java's Double.toString matches DuckDB's shortest-round-
      // trip decimals for values in plain-decimal range (all flagship
      // outputs); the engines' exponent spellings differ for extreme
      // magnitudes (1.0E16 vs 1e+16). Written under the stdout lock so
      // concurrent files can't interleave into each other's chunk.
      val text = new StringBuilder
      text.append(s"Chunk - [${fields.length} Columns]\n")
      var c = 0
      while (c < fields.length) {
        val vals = batch.map(r =>
          if (r.isNullAt(c)) "NULL" else r.get(c).toString)
        text.append(s"- FLAT ${duckTypeName(fields(c).dataType)}: ")
          .append(batch.size).append(" = [ ")
          .append(vals.mkString(", ")).append("]\n")
        c += 1
      }
      System.out.synchronized { print(text.toString) }
      batch.clear()
    }
    while (it.hasNext) {
      batch += it.next()
      hits += 1
      if (batch.size >= 2048) flush()
    }
    flush()
    hits
  }

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Opts())

    val sources = Iterator.continually(scala.io.StdIn.readLine())
      .takeWhile(_ != null).flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .toVector
    val shuffled = new Random(1).shuffle(sources)

    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-runner")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    s3aConfigs(opts).foreach { case (k, v) => builder.config(k, v) }
    ghttpConfigs(opts).foreach { case (k, v) => builder.config(k, v) }
    // the plain-HTTP monitored object profile (graft.io.GraftHttpFileSystem)
    // — ghttp:// sources count every ranged GET and its wire bytes, the
    // reference's read-op semantics (runner.cc:75–172)
    builder.config("spark.hadoop.fs.ghttp.impl",
                   "graft.io.GraftHttpFileSystem")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    val pool = Executors.newFixedThreadPool(opts.threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)

    // Snapshot the (monotonic, JVM-global) s3 op counter so the stat block
    // reports only this run's window; only trustworthy in local mode where
    // every read happens in this JVM.
    val s3OpsBefore =
      if (spark.sparkContext.isLocal) Metrics.s3ReadOps().getOrElse(0L)
      else 0L
    val (ghttpOpsBefore, _, ghttpBytesBefore) =
      graft.io.GraftHttpFileSystem.snapshot
    val t0 = System.nanoTime()
    val futures = shuffled.map { src =>
      Future(Try(runOne(spark, src)) match {
        case Success(hits) => hits
        case Failure(e) =>   // per-file isolation (runner.cc:293–297)
          System.err.println(s"error processing $src: ${e.getMessage}")
          0L
      })
    }
    val totalHits = Await.result(Future.sequence(futures), Duration.Inf).sum
    val t1 = System.nanoTime()
    pool.shutdown()

    // ghttp counters are driver-JVM AtomicLongs: only authoritative in
    // local mode (on a cluster, executor GETs happen in other JVMs) —
    // same gating as the s3a counter below.
    val (ghttpOpsAfter, _, ghttpBytesAfter) =
      graft.io.GraftHttpFileSystem.snapshot
    val ghttpOps =
      if (spark.sparkContext.isLocal) ghttpOpsAfter - ghttpOpsBefore else 0L
    // disjoint counters (ghttp streams never update Hadoop FS statistics,
    // so the listener's bytesRead misses them): total = sum, not either.
    val bytes = metrics.bytesRead +
      (if (spark.sparkContext.isLocal) ghttpBytesAfter - ghttpBytesBefore
       else 0L)
    System.err.println(
      s"Number data sources (parquet files): ${sources.size}")
    System.err.println(s"Threads: ${opts.threads}")
    System.err.println(f"Total Query time: ${(t1 - t0) / 1e9}%.2f s")
    System.err.println(s"Total hits: $totalHits")
    // Object-store read ops, preference order: the monitored ghttp
    // profile counts actual ranged GETs (exactly the reference's
    // semantics, runner.cc:109–117); else s3a stream_read_operations as
    // a this-run delta, local mode only — on a real cluster the
    // driver-side counter misses executor reads entirely; scan-task
    // count is the documented fallback (SURVEY.md §3.3).
    val s3Ops =
      if (spark.sparkContext.isLocal)
        Metrics.s3ReadOps().map(_ - s3OpsBefore).filter(_ > 0)
      else None
    if (ghttpOps > 0)
      System.err.println(s"Total read ops: $ghttpOps")
    else s3Ops match {
      case Some(ops) =>
        System.err.println(s"Total read ops: $ops")
      case None =>
        System.err.println(s"Total read ops (scan tasks): ${metrics.readTasks}")
    }
    System.err.println(s"Total read bytes: $bytes")
    System.err.println(f"... in KBs: ${bytes / 1e3}%.2f")
    System.err.println(f"... in MBs: ${bytes / 1e6}%.2f")
    System.err.println(f"... in GBs: ${bytes / 1e9}%.2f")
    System.err.println("Done")
    spark.stop()
  }
}
