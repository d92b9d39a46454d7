package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory (SURVEY.md §2.3) is assembled from the category
  * modules under `graft.ops`; every oracle-matched query obeys the
  * determinism rules in [[graft.ops]] (total ordering, exact-decimal sums,
  * aligned integer widths, round(·,6) clamps).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — the reference's query
    * template (reference runner.cc:174–182) retargeted at lineitem;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ScanFilterOps.queries("q_scan_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ScanFilterOps.queries ++ JoinOps.queries ++ AggOps.queries ++
      WindowOps.queries ++ SortSetOps.queries ++ FuncOps.queries ++
      TextOps.queries ++ DedupOps.queries ++ SimOps.queries ++
      MultimodalOps.queries ++ PipelineOps.queries ++
      WarehouseOps.queries ++ EventOps.queries ++ GraphOps.queries ++
      graft.streaming.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q_mm_decode — the decode stub is engine-local by design) → driver
    * records a weaker rows-only check. Deterministic-but-engine-specific
    * results (q_sample_seeded, q_agg_approx_distinct) carry GOLDEN pins
    * instead (graft.ops.GoldenOracles): the exact sf0.01 rows as a
    * VALUES oracle, upgrading them to full hash checks. */
  def oracleSql: Map[String, String] =
    ScanFilterOps.oracles ++ JoinOps.oracles ++ AggOps.oracles ++
      WindowOps.oracles ++ SortSetOps.oracles ++ FuncOps.oracles ++
      TextOps.oracles ++ DedupOps.oracles ++ SimOps.oracles ++
      MultimodalOps.oracles ++ PipelineOps.oracles ++
      WarehouseOps.oracles ++ EventOps.oracles ++ GraphOps.oracles ++
      graft.streaming.StreamOps.oracles
}
