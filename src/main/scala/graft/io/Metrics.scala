package graft.io

import java.util.concurrent.atomic.{AtomicLong, LongAdder}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Run-level I/O accounting (SURVEY.md §2.1 A13–A15).
  *
  * The reference counts read ops and bytes by wrapping DuckDB's FileSystem
  * (reference runner.cc:75–172); the Spark-idiomatic seam for the same
  * observation is a SparkListener over task input metrics. `bytesRead` is
  * exact. A per-HTTP-GET "read ops" count has no task-level Spark analog, so
  * `readTasks` (scan tasks that actually read input) is reported as the
  * documented approximation (SURVEY.md §3.3).
  */
class Metrics extends SparkListener {
  private val bytes = new LongAdder
  private val records = new LongAdder
  private val tasks = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val in = taskEnd.taskMetrics.inputMetrics
    if (in.bytesRead > 0 || in.recordsRead > 0) {
      bytes.add(in.bytesRead)
      records.add(in.recordsRead)
      tasks.incrementAndGet()
    }
  }

  def bytesRead: Long = bytes.sum
  def recordsRead: Long = records.sum
  def readTasks: Long = tasks.get
}

object Metrics {
  /** Filesystem-level read-op count from Hadoop's global storage
    * statistics — the closest Spark-side analog to the reference's
    * per-read counter (its MonitoredFileSystem wraps every FS read,
    * reference runner.cc:86–94,109–117). For s3a this is
    * `stream_read_operations` (≈ HTTP range GETs); for local files the
    * scheme's generic `read_ops`. Returns None when no scheme exposes a
    * counter (then the scan-task approximation is the fallback). Note:
    * JVM-global and monotonic, so callers snapshot before/after a run. */
  def fsReadOps(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val stats = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
      .iterator().asScala.toSeq
    val counts = stats.flatMap { s =>
      Seq("stream_read_operations", "readOps").flatMap { k =>
        Option(s.getLong(k)).map(_.longValue()).filter(_ > 0).headOption
          .map(v => (s.getScheme, k, v))
      }.headOption
    }
    if (counts.isEmpty) None else Some(counts.map(_._3).sum)
  }
}
