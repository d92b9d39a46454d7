package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-matched operator inventory (SURVEY.md §2.3).
  *
  * Determinism policy (SURVEY.md §7.3) — every oracle-matched query:
  *   - ends with an ORDER BY whose key suffix is unique (total order);
  *   - never emits a raw double aggregate whose value depends on summation
  *     order: sums of doubles go through DECIMAL(18,6) (exact, associative),
  *     averages are exact-decimal-sum / count, and any residual double is
  *     clamped with round(_, 6);
  *   - aligns integer widths with DuckDB (BIGINT) by explicit casts, because
  *     the driver hash-compares values column-by-column.
  */
package object ops {
  /** A query builder: (session, scale-factor dir) => result frame. */
  type QB = (SparkSession, String) => DataFrame

  /** Fixture columns that are time-typed and therefore subject to the
    * generator's precision choice; each is normalized on read. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    tsColumns.get(name) match {
      case Some(cols) =>
        // Schema-on-read for time-typed fixture columns — the physical type
        // is the generator's choice, not ours (the reference delegates
        // schema to the engine's parquet footer read, runner.cc:178; DuckDB
        // reads any timestamp precision transparently). Dispatch on the
        // footer type:
        //   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so
        //     read the raw int64 (nanosAsLong) and truncate ns→µs — exactly
        //     what DuckDB does on read (SURVEY.md §7.3);
        //   - timestamp NTZ: cast to session-TZ timestamp — the session is
        //     pinned UTC (SessionDefaults), so the cast is value-identity
        //     and downstream unix_micros/date_trunc see the same µs values;
        //   - timestamp (UTC-adjusted): already TimestampType, pass through.
        // The conf set is session-global but idempotent (always true, set
        // before every read that could see a NANOS footer) — it only
        // changes how NANOS columns surface, never µs/ms ones.
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/$name.parquet")
        cols.foldLeft(raw)((df, c) => normalizeTs(df, c))
      case None => s.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** Size-gated post-scan spread (round 21; guide §2.5 "input skew" /
    * §1.2 step 1): the bench fixtures are single-row-group parquet
    * files — an unsplittable one-task scan — so everything before a
    * query's first exchange (projection, filters, string/JSON kernels,
    * the partial aggregate, the first join's shuffle write) serializes
    * on one core while the rest idle. Below the gate (input under
    * spark.graft.spread.maxBytes, default 256 MiB; 0 disables) one
    * HASH exchange of the PRUNED columns (Catalyst pushes column
    * pruning through RepartitionByExpression) on a caller-named
    * high-cardinality content key spreads that work across the cores;
    * above the gate the scan is already multi-split and this is the
    * identity — at 100 TB no extra exchange exists. Results are
    * partition-layout-independent for every consumer: no query uses
    * partition-sensitive expressions (monotonically_increasing_id,
    * spark_partition_id, input_file_name — audited r21), and
    * q_sample_seeded (per-partition Bernoulli RNG) deliberately keeps
    * the bare [[table]] read. The content-hash partition is
    * retry-deterministic by construction (no sort needed — see the
    * inline comment for why round-robin was rejected by measurement).
    * Applied per query where the pre-exchange work measurably
    * dominates — NOT inside [[table]] — so light scans keep their
    * exchange-free plans (see graft.plans.TinyAggSingularize for the
    * opposite trade on cheap aggregates). */
  def spreadTable(s: SparkSession, dir: String, name: String,
                  key: Column,
                  // Per-site gate ceiling (round 22, VERDICT r21 #4/#6):
                  // a site whose pre-exchange work stops dominating well
                  // below the global 256 MiB gate (q_bpe_apply: the
                  // encode is one pure codegen map, so a ~59 MB input
                  // already scans multi-task-adjacent and the extra
                  // exchange measured ~2× slower at the 100× sweep)
                  // caps its own gate; the effective gate is
                  // min(conf, site), so the conf kill switch (0) still
                  // disables every site.
                  siteMaxBytes: Long = Long.MaxValue): DataFrame = {
    val df = table(s, dir, name)
    val confB = s.conf.get("spark.graft.spread.maxBytes",
      String.valueOf(256L << 20)).toLong
    val maxB = math.min(confB, siteMaxBytes)
    if (maxB > 0 && inputBytes(s"$dir/$name.parquet") <= maxB &&
        s.sparkContext.defaultParallelism > 1)
      // HASH repartition on a caller-named high-cardinality content
      // key — NOT round-robin: repartition(n) pays a full local sort
      // of the input inside the single scan task
      // (spark.sql.execution.sortBeforeRepartition, required there for
      // retry determinism), which A/B-measured strictly worse than no
      // spread at all on 14/18 agg queries. A content-hash partition
      // is retry-deterministic by construction and skips the sort.
      df.repartition(s.sparkContext.defaultParallelism, key)
    else df
  }

  /** On-disk bytes of a parquet path (file or one-level directory);
    * Long.MaxValue when unreadable so the caller's gate fails closed
    * (no spread) rather than shuffling an unknown-size input. */
  private[ops] def inputBytes(path: String): Long = try {
    val f = new java.io.File(path)
    if (f.isFile) f.length
    else if (f.isDirectory)
      Option(f.listFiles()).map(_.map(_.length).sum)
        .getOrElse(Long.MaxValue)
    else Long.MaxValue
  } catch { case _: Exception => Long.MaxValue }

  /** Normalize one time column to session-TZ TimestampType (µs), whatever
    * physical representation the fixture carried. Shared by the batch
    * reader above and the streaming staging (StreamOps). */
  def normalizeTs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType => // raw int64 ns (nanosAsLong read of a NANOS fixture)
        df.withColumn(colName, timestamp_micros(expr(s"$colName DIV 1000")))
      case TimestampNTZType => // µs wall-clock; UTC session ⇒ value-identity
        df.withColumn(colName, col(colName).cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"$colName: unsupported fixture type $other — expected " +
        "TIMESTAMP(NANOS) (read as long), timestamp_ntz, or timestamp")
    }
  }

  /** Back-compat alias for the events-specific call sites (StreamOps). */
  def normalizeEventsTs(df: DataFrame): DataFrame = normalizeTs(df, "ts")

  /** Exact, summation-order-independent sum of a double column.
    * Casting each value to DECIMAL(18,6) is a per-row deterministic op; the
    * decimal sum is exact, so partial/final aggregation order (Spark) vs
    * serial order (DuckDB) cannot change the result. Final cast back to
    * double is IEEE round-to-nearest of an exact value — identical in both
    * engines. Oracle spelling: CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE).
    */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Order-independent average: exact decimal sum divided by count.
    * Oracle spelling:
    * CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Residual float clamp (both engines round doubles half-up on the
    * shortest decimal representation — verified empirically). */
  def r6(c: Column): Column = round(c, 6)

  /** 32-bit deterministic string hash expressible identically in DuckDB:
    * first 8 hex chars of md5, parsed as an integer.
    * Oracle spelling: CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT). */
  def md5hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** 60-bit deterministic string hash (first 15 hex chars of md5 — the
    * widest md5 prefix that parses as a non-negative signed BIGINT in both
    * engines). Use for corpus-wide-cardinality keys (chunk/shingle content
    * hashes): at 100 TB the population reaches trillions of distinct keys,
    * where a 32-bit space is fully saturated and birthday collisions would
    * dominate dup/contamination counts; 60 bits keeps the expected
    * collision count below ~1 per 10^9 keys² pairing.
    * 32-bit stays appropriate for SMALL co-domains (bucket assignment
    * mod 100, MinHash permutation inputs — whose arithmetic h*19+8 would
    * overflow int64 on 60-bit inputs).
    * Oracle spelling: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT). */
  def md5hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Count-Min sketch row hashes, shared by the batch (q_agg_countmin)
    * and streaming (q_stream_countmin) sketches — whose oracle identity
    * "replaying the fixture equals the batch sketch" depends on the two
    * spellings staying byte-for-byte in sync, so the arithmetic lives
    * here once. One md5 digest per key ([[cmDigest]]); each of the 4
    * sketch rows reads its own disjoint 8-hex-char (32-bit) slice mod
    * the 256-cell width ([[cmBuckets]] — pass the PRE-COMPUTED digest
    * column, not the raw key, or the lambda re-hashes per slice).
    * Oracle spelling per row r:
    * CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), r*8+1, 8)) AS BIGINT)
    * % 256. */
  def cmDigest(key: Column): Column =
    md5(key.cast("string").cast("binary"))

  def cmBuckets(digest: Column): Column =
    transform(sequence(lit(0), lit(3)),
      r => pmod(conv(digest.substr(r * 8 + 1, lit(8)), 16, 10)
                  .cast("long"),
                lit(256)))

  /** Native codegen spelling of cmBuckets(cmDigest(key)) — what the
    * PRODUCTION sketch builds (batch q_agg_countmin, the streaming
    * sketches) use: the HOF form above evaluates 4 interpreted
    * conv(substr(digest)) lambdas per row, which dominates the sketch
    * build's scan at corpus scale; the expression is one digest + 4
    * shifts inside whole-stage codegen. The HOF form stays as the
    * reference spelling (it IS the oracle's arithmetic) that
    * CmBucketsSpec proves bucket-identical. */
  def cmBucketsFast(key: Column): Column =
    graft.functions.TextFunctions.cmBucketsNative(key.cast("string"), 256)
}
