package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions + batch time-bucketing (SURVEY.md §2.3).
  *
  * Window partition keys (l_orderkey, user_id) are the shuffle keys; frames
  * are evaluated per-partition after a single sort, so at scale each window
  * query costs exactly one shuffle. `events.ts` is ns-precision parquet that
  * both Spark and DuckDB 1.0 read truncated to µs, so ts is directly
  * comparable (SURVEY.md §7.3); window orderings still carry an event_id
  * tiebreak so equal-µs rows cannot flip between engines.
  */
object WindowOps {

  val queries: Map[String, QB] = Map(
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(desc("l_extendedprice"), asc("l_linenumber"))
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"))
        // (l_orderkey, l_linenumber) is NOT unique in the generated data;
        // rn is unique within an l_orderkey partition, so (l_orderkey, rn)
        // totally orders the output.
        .orderBy("l_orderkey", "rn")
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, d, "events")
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("running"))
        .orderBy("user_id", "event_id")
    }),

    "q_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("user_id", "event_id")
    }),

    // Frame navigation: first/last/nth value over a full-partition frame.
    "q_window_firstlast" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(desc("l_extendedprice"), asc("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          first(col("l_extendedprice")).over(w).as("top_price"),
          last(col("l_extendedprice")).over(w).as("bottom_price"),
          nth_value(col("l_extendedprice"), 2).over(w).as("second_price"))
        .orderBy("l_orderkey", "l_linenumber", "top_price")
    }),

    // Ranking distributions: percent_rank / cume_dist / ntile — all
    // deterministic because the window ordering (value, event_id) is total.
    // event_type has ~5 distinct values, and a window partition cannot be
    // split by AQE — partitioning the raw table on it funnels everything
    // through ≤5 reducers at 100×. Distributed-rank rewrite instead:
    // (1) value-bucket each row (vb monotone in value, width 0.25 → ~2k
    //     buckets on this corpus; the width is the splittability dial);
    // (2) per-(event_type, vb) row counts → cumulative offsets via a
    //     window over the TINY aggregated frame (bucket-cardinality rows,
    //     a bounded input, so the ≤5-way partition key is safe there);
    // (3) per-row rank = broadcast-joined bucket offset + local row_number
    //     within (event_type, vb) — a splittable window partition key.
    // With a total ordering, rank == row_number, so pr = (rn-1)/(N-1),
    // cd = rn/N, and ntile(4) is arithmetic on (rn, N) — identical output
    // to the single-window spelling the oracle uses.
    "q_window_pct" -> ((s, d) => {
      val e = table(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("vb", floor(col("value") * 4).cast("long"))
      val counts = e.groupBy(col("event_type"), col("vb"))
        .agg(count(lit(1)).as("nb"))
      val wOff = Window.partitionBy(col("event_type")).orderBy(col("vb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts
        .withColumn("off", coalesce(sum(col("nb")).over(wOff), lit(0L)))
        .withColumn("n", sum(col("nb")).over(Window.partitionBy(col("event_type"))))
        .select(col("event_type").as("o_et"), col("vb").as("o_vb"),
                col("off"), col("n"))
      val wLoc = Window.partitionBy(col("event_type"), col("vb"))
        .orderBy(col("value"), col("event_id"))
      val q = lit(4L)
      e.join(broadcast(offsets),
          col("event_type") === col("o_et") && col("vb") === col("o_vb"))
        .withColumn("rn", col("off") + row_number().over(wLoc))
        .withColumn("base", (col("n") / q).cast("long"))
        .withColumn("rem", col("n") % q)
        .select(col("event_type"), col("event_id"), col("value"),
          r6(when(col("n") > 1,
              (col("rn") - 1).cast("double") / (col("n") - 1).cast("double"))
            .otherwise(lit(0.0))).as("pr"),
          r6(col("rn").cast("double") / col("n").cast("double")).as("cd"),
          when(col("rn") <= (col("base") + 1) * col("rem"),
              (col("rn") - 1) / (col("base") + 1) + 1)
            .otherwise(col("rem")
              + (col("rn") - 1 - (col("base") + 1) * col("rem")) / col("base")
              + 1).cast("long").as("quartile"))
        .orderBy("event_type", "event_id")
    }),

    // Rolling time window via a RANGE frame over epoch-µs: per user, the
    // sum/count of events in the trailing hour — the batch twin of a
    // sliding streaming aggregation, one shuffle by user.
    "q_window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
        .rangeBetween(-3600000000L, 0L)
      table(s, d, "events")
        .withColumn("tsu", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("tsu"),
          count(lit(1)).over(w).as("n_trailing_1h"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("sum_trailing_1h"))
        .orderBy("user_id", "event_id")
    }),

    // Top-k per group. l_returnflag has 3 distinct values, and a window
    // partition cannot be split by AQE — a bare row_number over it funnels
    // the whole fact table through 3 reducers at 100×. Salted two-pass
    // instead: hash-salt each flag into 32 sub-partitions and keep the
    // local top-3 per (flag, salt) — any row in the global top-3 is
    // necessarily in its salt bucket's top-3, so the survivor set
    // (≤ 3·32 rows per flag) contains the answer. The final 3-partition
    // window then runs over a BOUNDED input (k·salts rows per flag), which
    // is the guarantee that makes the low-cardinality key safe. Output is
    // identical to the single-window spelling the oracle uses: survivors
    // are a superset of the top-3 under the same total preference order.
    "q_topk_per_group" -> ((s, d) => {
      val k = 3
      val salts = 32
      val ord = Seq(desc("l_extendedprice"), asc("l_orderkey"),
                    asc("l_linenumber"))
      val wPartial = Window
        .partitionBy(col("l_returnflag"), col("salt")).orderBy(ord: _*)
      val wFinal = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
      spreadTable(s, d, "lineitem", col("l_orderkey"))
        .select(col("l_returnflag"), col("l_extendedprice"),
                col("l_orderkey"), col("l_linenumber"))
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
        .withColumn("prn", row_number().over(wPartial))
        .filter(col("prn") <= k)
        .withColumn("rn", row_number().over(wFinal).cast("long"))
        .filter(col("rn") <= k)
        .select(col("l_returnflag"), col("l_extendedprice"), col("rn"))
        .orderBy("l_returnflag", "rn")
    }),

    // Tumbling 1-hour buckets via Spark's streaming-compatible window();
    // window.start == date_trunc('hour', ts) for aligned 1h windows. The
    // bucket is emitted as epoch-µs (BIGINT) — raw timestamp outputs would
    // compare tz-aware (Spark parquet) against naive (DuckDB).
    "q_window_tumbling" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .select(unix_micros(col("window.start")).as("bucket"),
                col("event_type"), col("n"), col("total"))
        .orderBy("bucket", "event_type")),

    // Exponentially-weighted moving average per user — the time-series
    // smoothing primitive of a monitoring pipeline, spelled EXACTLY:
    // true EWMA is a recurrence (not expressible as one window frame),
    // so this is the standard 8-term truncation with α = 1/2 — weights
    // 128,64,…,1 over the last 8 events, renormalized over the terms
    // actually present (the tail contributes < 0.4% at 8 terms). All
    // arithmetic is integer: value enters as exact DECIMAL(18,2) cents
    // (the fixture's 2-decimal bounded domain), the weighted sum is a
    // cents×weight×10⁴ BIGINT, the divide is half-up integer — no float
    // in the compare path, so an 8-term lag chain hash-matches DuckDB's.
    // One shuffle: all 8 lags share the (user_id | ts, event_id) window
    // spec, so Spark evaluates them in a single Window operator after a
    // single exchange+sort — the event_id tiebreak makes equal-µs rows
    // engine-stable.
    "q_window_ewma" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = table(s, d, "events")
        .filter(col("value").isNotNull && !isnan(col("value")))
        .withColumn("v_cents",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
      val terms = (0 to 7).map { k =>
        val wk = 1L << (7 - k)
        val vk = if (k == 0) col("v_cents") else lag(col("v_cents"), k).over(w)
        (coalesce(vk, lit(0L)) * lit(wk * 10000L),
         when(vk.isNotNull, lit(wk)).otherwise(lit(0L)))
      }
      ev.withColumn("num", terms.map(_._1).reduce(_ + _))
        .withColumn("den", terms.map(_._2).reduce(_ + _))
        .select(col("event_id"), col("user_id"), col("v_cents"),
                expr("(num + den DIV 2) DIV den").as("ewma_micro"))
        .orderBy("event_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_window_rank" -> """
      SELECT l_orderkey, l_linenumber,
             row_number() OVER w AS rn, rank() OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber)
      ORDER BY l_orderkey, rn""",

    "q_window_running" -> """
      SELECT user_id, event_id,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) AS running
      FROM events
      ORDER BY user_id, event_id""",

    "q_window_lag_lead" -> """
      SELECT user_id, event_id, value,
             lag(value) OVER w AS prev_value,
             lead(value) OVER w AS next_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "q_window_firstlast" -> """
      SELECT l_orderkey, l_linenumber,
             first_value(l_extendedprice) OVER w AS top_price,
             last_value(l_extendedprice) OVER w AS bottom_price,
             nth_value(l_extendedprice, 2) OVER w AS second_price
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey
                   ORDER BY l_extendedprice DESC, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
      ORDER BY l_orderkey, l_linenumber, top_price""",

    "q_window_pct" -> """
      SELECT event_type, event_id, value,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             ntile(4) OVER w AS quartile
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
      ORDER BY event_type, event_id""",

    "q_window_range_frame" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value
                 FROM events)
      SELECT user_id, event_id, tsu,
             count(*) OVER w AS n_trailing_1h,
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
               AS sum_trailing_1h
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tsu
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id""",

    "q_topk_per_group" -> """
      SELECT l_returnflag, l_extendedprice, rn FROM (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
                 AS rn
        FROM lineitem)
      WHERE rn <= 3
      ORDER BY l_returnflag, rn""",

    "q_window_tumbling" -> """
      SELECT epoch_us(date_trunc('hour', ts)) AS bucket, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
      ORDER BY bucket, event_type""",

    "q_window_ewma" -> """
      WITH ev AS (SELECT event_id, user_id, ts,
                         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                           AS v_cents
                  FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)),
      l AS (SELECT event_id, user_id, v_cents,
                   lag(v_cents, 1) OVER w AS v1, lag(v_cents, 2) OVER w AS v2,
                   lag(v_cents, 3) OVER w AS v3, lag(v_cents, 4) OVER w AS v4,
                   lag(v_cents, 5) OVER w AS v5, lag(v_cents, 6) OVER w AS v6,
                   lag(v_cents, 7) OVER w AS v7
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT event_id, user_id, v_cents,
                   v_cents * 1280000
                   + coalesce(v1, 0) * 640000 + coalesce(v2, 0) * 320000
                   + coalesce(v3, 0) * 160000 + coalesce(v4, 0) * 80000
                   + coalesce(v5, 0) * 40000 + coalesce(v6, 0) * 20000
                   + coalesce(v7, 0) * 10000 AS num,
                   128 + CASE WHEN v1 IS NULL THEN 0 ELSE 64 END
                       + CASE WHEN v2 IS NULL THEN 0 ELSE 32 END
                       + CASE WHEN v3 IS NULL THEN 0 ELSE 16 END
                       + CASE WHEN v4 IS NULL THEN 0 ELSE 8 END
                       + CASE WHEN v5 IS NULL THEN 0 ELSE 4 END
                       + CASE WHEN v6 IS NULL THEN 0 ELSE 2 END
                       + CASE WHEN v7 IS NULL THEN 0 ELSE 1 END AS den
            FROM l)
      SELECT event_id, user_id, v_cents,
             (num + den // 2) // den AS ewma_micro
      FROM t
      ORDER BY event_id""",
  )
}
