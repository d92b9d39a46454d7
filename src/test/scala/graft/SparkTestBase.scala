package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (JVM-wide, cheap to reuse). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions { e =>
        e.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)
        e.injectOptimizerRule(_ => graft.plans.TinyAggSingularize)
        e.injectRuntimeOptimizerRule(_ =>
          graft.plans.TinySortSingularize)
      }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The suites run many throwaway stream queries through one JVM-wide
    // session — opt in to the harness-only per-query stream teardown
    // (see StreamOps' runStreamN finally block).
    s.conf.set("spark.graft.stream.teardown", "true")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0001 = "/root/testdata/sf0.001"
}
