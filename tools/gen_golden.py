#!/usr/bin/env python3
"""Regenerate src/main/scala/graft/ops/GoldenOracles.scala from a fresh
driver-identical Verify run — needed ONLY if the driver regenerates the
sf0.01 fixture (the pins are fixture-exact by design; their count(*)
tripwires go loud on any other fixture).

Usage:
  rm -rf /tmp/vout_gold
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_gold \
      q_sample_seeded,q_agg_approx_distinct"
  python3 tools/gen_golden.py /root/testdata/sf0.01 /tmp/vout_gold
"""
import sys, glob
import duckdb
import pyarrow.parquet as pq

sf_dir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
n_li = con.execute(
    f"SELECT count(*) FROM '{sf_dir}/lineitem.parquet'").fetchone()[0]
n_ev = con.execute(
    f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]

sample = pq.read_table(
    glob.glob(f"{vout}/q_sample_seeded/*.parquet")[0]).to_pylist()
vals = ",".join(f"({r['l_orderkey']},{r['l_linenumber']})" for r in sample)

approx = pq.read_table(
    glob.glob(f"{vout}/q_agg_approx_distinct/*.parquet")[0]).to_pylist()
avals = ",".join(f"('{r['event_type']}',{r['approx_users']})"
                 for r in approx)

scala = f'''package graft.ops

/** GENERATED golden oracle pins (round 20 — VERDICT r19 #6). Spark-side
  * results that are deterministic but not ORACLE-DERIVABLE in DuckDB
  * (engine-specific RNG / sketch internals) are pinned to the exact rows
  * the engine produces on the sf0.01 driver fixture, upgrading their
  * correctness row from rows-only to a full hash check:
  *
  *  - q_sample_seeded: Spark's Bernoulli sampler (seed 42) is
  *    deterministic given data + scan partitioning; the sf0.01 lineitem
  *    is 1.0 MiB < the 4 MiB openCost floor, so the scan is ONE
  *    partition under any core count — the sample is fully
  *    partitioning-stable (law-tested in RowsOnlySpec). {len(sample)} rows,
  *    collected from the driver-identical Verify session.
  *  - q_agg_approx_distinct: HLL++ register-max merge is commutative,
  *    so the estimate is partitioning-independent.
  *
  * Each oracle carries a fixture TRIPWIRE (a count(*) guard on the
  * source table): run against any other fixture it returns 0 rows — a
  * loud ROWCOUNT failure instead of a misleading value diff. Regenerate
  * with tools/gen_golden.py if the driver fixture is ever regenerated.
  */
object GoldenOracles {{

  /** {len(sample)} (l_orderkey, l_linenumber) pairs — the exact sf0.01
    * seed-42 1% Bernoulli sample, in the query's output order. */
  val sampleSeededSql: String =
    """SELECT CAST(col0 AS BIGINT) AS l_orderkey,
              CAST(col1 AS INTEGER) AS l_linenumber
       FROM (VALUES {vals}) v
       WHERE (SELECT count(*) FROM lineitem) = {n_li}
       ORDER BY l_orderkey, l_linenumber"""

  val approxDistinctSql: String =
    """SELECT col0 AS event_type, CAST(col1 AS BIGINT) AS approx_users
       FROM (VALUES {avals}) v
       WHERE (SELECT count(*) FROM events) = {n_ev}
       ORDER BY event_type"""
}}
'''
path = "src/main/scala/graft/ops/GoldenOracles.scala"
open(path, "w").write(scala)
print(f"wrote {path}: {len(sample)} sample rows, {len(approx)} approx rows")
