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
  /** Object-store read-op count from Hadoop's global storage statistics —
    * the closest Spark-side analog to the reference's per-read counter
    * (its MonitoredFileSystem wraps every FS read, reference
    * runner.cc:86–94,109–117): s3a's `stream_read_operations` ≈ HTTP
    * range GETs. Restricted to s3 schemes (mixing local-file readOps into
    * the same number would be meaningless); None when no s3 filesystem
    * has been touched — callers fall back to the scan-task approximation.
    *
    * The counter is JVM-global and monotonic, and in-JVM only — it sees
    * nothing from remote executors — so it is only meaningful in local
    * mode and as a before/after delta around the measured window; the
    * caller (runner/Main) gates on `sparkContext.isLocal` and snapshots
    * around the run. */
  def s3ReadOps(): Option[Long] = {
    import scala.jdk.CollectionConverters._
    val counts = org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics
      .iterator().asScala.toSeq
      .filter(s => s.getScheme == "s3a" || s.getScheme == "s3")
      .flatMap(s => Option(s.getLong("stream_read_operations"))
        .map(_.longValue()))
    if (counts.isEmpty) None else Some(counts.sum)
  }
}
