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
