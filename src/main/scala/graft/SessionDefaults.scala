package graft

import org.apache.spark.sql.SparkSession

/** One place owning the local-session tuning shared by the driver
  * surfaces (Bench and Verify) — hand-syncing these configs across two
  * builders already drifted once; a config added here is guaranteed to
  * apply to both the measured plan and the oracle-checked plan. */
object SessionDefaults {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Every driver-generated parquet is a SINGLE row group (verified
      // across sf0.001–0.1), so sub-file splits can never fan out — they
      // only schedule empty tasks (the r3 4m setting cost the flagship
      // ~0.07 s/run in empty-split overhead). 16m keeps the 10.8 MB
      // lineitem at exactly one split while still splitting any genuinely
      // large multi-row-group file a bigger fixture might bring. At
      // cluster scale this would stay at the 128m default.
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // Coalesce post-shuffle partitions by SIZE, not up to core count:
      // iterative/small-intermediate queries (dedup clustering) otherwise
      // pay full-width near-empty task waves per exchange per round. The
      // small 2m advisory keeps mid-size shuffles (tens of MB) spread
      // across the cores — the 64m default would collapse them to 1-2
      // tasks.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
              "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.ui.enabled", "false")
      // Engine extensions: date-interval theta joins rewrite to binned
      // equi-joins (graft.plans.RangeJoinBinning, kill switch
      // spark.graft.rangeJoinBin.enabled=false); global sorts over
      // runtime-verified tiny AQE stages drop the range exchange +
      // sampling job (graft.plans.TinySortSingularize, kill switch
      // spark.graft.tinySort.enabled=false); aggregates over exact-size-
      // tiny single-split scans fuse to one exchange-free stage
      // (graft.plans.TinyAggSingularize, kill switch
      // spark.graft.tinyAgg.enabled=false).
      .withExtensions { e =>
        e.injectOptimizerRule(_ => graft.plans.RangeJoinBinning)
        e.injectOptimizerRule(_ => graft.plans.TinyAggSingularize)
        e.injectRuntimeOptimizerRule(_ =>
          graft.plans.TinySortSingularize)
      }
}
