package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` fixture (round-5 additions):
  * conversion funnel, weekly cohort retention, and activity streaks
  * (gaps-and-islands). The reference harness has no event analytics — these
  * extend the declared inventory (SURVEY.md §2.3) with the shapes an
  * event-log warehouse runs daily.
  *
  * Scale posture: every query here is (a) one `groupBy(user_id)` shuffle to
  * build the per-user anchor (first signup / first event / distinct days),
  * then (b) an equi-join back on user_id with any time predicate as a
  * residual — hash joins end to end, never a theta-only join. Week/day
  * bucketing happens before the final aggregation, so the last shuffle is
  * keyed on the (small) bucket space, not on users.
  */
object EventOps {

  val queries: Map[String, QB] = Map(
    // Conversion funnel: per signup-cohort week, how many signed-up users
    // made a purchase within 7 days of their FIRST signup. The 7-day
    // window rides the user_id equi-join as a residual predicate (hash
    // join, not a range-only theta join).
    "q_funnel" -> ((s, d) => {
      val ev = table(s, d, "events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("pts"))
      su.join(pur,
          col("user_id") === col("p_user") &&
          col("pts") >= col("signup_ts") &&
          col("pts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"), "left")
        .groupBy(col("user_id"), col("signup_ts"))
        .agg(count(col("pts")).as("n_purch_7d"))
        .groupBy(unix_micros(date_trunc("week", col("signup_ts")))
          .as("cohort_week"))
        .agg(count(lit(1)).as("n_signups"),
             sum(when(col("n_purch_7d") > 0, 1L).otherwise(0L))
               .as("n_converted"))
        .withColumn("conv_rate",
          r6(col("n_converted").cast("double") / col("n_signups")))
        .orderBy("cohort_week")
    }),

    // Multi-step ORDERED funnel: view → click → purchase, each step
    // strictly at-or-after the previous step's first occurrence (an
    // unordered "did all three" count would overstate conversion). Three
    // stacked per-user windows with unbounded frames: vts = first view;
    // cts = first click with ts >= vts; pts = first purchase with
    // ts >= cts. All three Window operators share the user_id
    // partitioning, so Spark reuses ONE exchange — the whole funnel costs
    // a single shuffle of the event log plus a per-user dedup aggregate.
    // (The fixture's event vocabulary has no "cart"; click is the
    // mid-funnel step.)
    "q_funnel_steps" -> ((s, d) => {
      val wU = Window.partitionBy(col("user_id"))
      table(s, d, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("vts",
          min(when(col("event_type") === "view", col("ts"))).over(wU))
        .withColumn("cts",
          min(when(col("event_type") === "click" &&
                   col("ts") >= col("vts"), col("ts"))).over(wU))
        .withColumn("pts",
          min(when(col("event_type") === "purchase" &&
                   col("ts") >= col("cts"), col("ts"))).over(wU))
        .groupBy(col("user_id"))
        .agg(max(col("vts")).as("uvts"), max(col("cts")).as("ucts"),
             max(col("pts")).as("upts"))
        .agg(count(col("uvts")).as("n_view"),
             count(col("ucts")).as("n_view_click"),
             count(col("upts")).as("n_view_click_purchase"))
    }),

    // Weekly cohort retention: cohort = week of a user's first event (any
    // type); the cell (cohort_week, week_k) counts users from that cohort
    // active k weeks later. Both week buckets are Monday-truncated on both
    // engines, so the week delta is an exact multiple of 7 days.
    "q_retention" -> ((s, d) => {
      val ev = table(s, d, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
        .distinct()
      cohort.join(active, "user_id")
        .select(unix_micros(col("cw")).as("cohort_week"),
          (datediff(col("aw"), col("cw")) / lit(7)).cast("long").as("week_k"))
        .groupBy("cohort_week", "week_k")
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_k")
    }),

    // Per-type z-score outlier audit: two-pass anomaly detection — a tiny
    // per-type stats aggregate (count + exact-decimal Σx and Σx²), then a
    // broadcast join-back scoring every event against its type's mean/σ.
    // Variance is spelled explicitly as (Σx² − (Σx)²/n)/(n−1) from the
    // exact sums rather than stddev_samp: the engines' streaming-variance
    // algorithms differ in rounding, the fixed expression tree over exact
    // inputs does not (SURVEY.md §7.3). At 100 TB the stats side is
    // |event_type| rows — always broadcastable — and the scoring pass is
    // a pure per-row map.
    "q_events_outliers" -> ((s, d) => {
      val ev = table(s, d, "events")
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             dsum(col("value")).as("s1"),
             dsum(col("value") * col("value")).as("s2"))
        .withColumn("mean", col("s1") / col("n"))
        .withColumn("sd", sqrt((col("s2") - col("s1") * col("s1") / col("n"))
                               / (col("n") - 1)))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mean")) / col("sd"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             r6(max(col("mean"))).as("mean"),
             r6(max(col("sd"))).as("sd"),
             sum(when(abs(col("z")) > 3.0, 1L).otherwise(0L))
               .as("n_outliers"),
             r6(max(col("z"))).as("max_z"))
        .orderBy("event_type")
    }),

    // Activity streaks (gaps-and-islands): runs of consecutive active days
    // per user. The island anchor is `day - row_number()` — constant
    // within a run of consecutive days — the standard O(1)-state
    // formulation: one shuffle by user, one window sort, one aggregate.
    "q_streaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      table(s, d, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("anchor"))
        .agg(min(col("day")).as("streak_start"),
             max(col("day")).as("streak_end"),
             count(lit(1)).as("n_days"))
        .select(col("user_id"), col("streak_start"), col("streak_end"),
                col("n_days"))
        .orderBy("user_id", "streak_start")
    }),

    // Robust outlier detection: median + MAD (median absolute deviation)
    // per event type, the estimator that survives the heavy tails that
    // wreck q_events_outliers' mean/stddev. Exact medians WITHOUT
    // buffering per-group values: `value` is a bounded-domain 2-decimal
    // measure, so a (type, value) count histogram is ≤ |types|×|domain|
    // rows AT ANY CORPUS SIZE — the cumulative-rank walk over that
    // histogram is exact and 100 TB-safe where a collect_list median is
    // an OOM. Both median passes (value, then |value−med|) use the same
    // histogram locate; med/mad frames are |types| rows, broadcast back.
    // The oracle mirrors the identical cumulative arithmetic (never
    // quantile_cont — its interpolation spelling is engine-internal).
    "q_events_mad" -> ((s, d) => {
      val ev = table(s, d, "events")
        .filter(col("value").isNotNull && !isnan(col("value")))
        .select(col("event_type"), col("value"))
      // Exact median of `vc` per event_type via count-histogram rank walk:
      // klo/khi are the 0-based middle ranks; med = (vlo + vhi) / 2.
      // The per-type total n rides a PARTITION-TOTAL window on the same
      // histogram frame (a separate df.groupBy(type).count() branch would
      // re-run the corpus-sized histogram subtree — no cross-branch
      // reuse), so each median pass costs exactly ONE corpus scan; both
      // windows share the type-keyed exchange, and the running sum's ROWS
      // frame is value-identical to RANGE because v is distinct within a
      // partition by construction.
      def histMedian(df: org.apache.spark.sql.DataFrame, vc: String,
                     out: String): org.apache.spark.sql.DataFrame = {
        val cw = Window.partitionBy(col("event_type")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tw = Window.partitionBy(col("event_type"))
        df.groupBy(col("event_type"), col(vc).as("v"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("cum_end", sum(col("cnt")).over(cw))
          .withColumn("cum_start", col("cum_end") - col("cnt"))
          .withColumn("n", sum(col("cnt")).over(tw))
          .withColumn("klo", expr("(n - 1) DIV 2"))
          .withColumn("khi", expr("n DIV 2"))
          .groupBy(col("event_type"))
          .agg(((max(when(col("cum_start") <= col("klo") &&
                          col("klo") < col("cum_end"), col("v"))) +
                 max(when(col("cum_start") <= col("khi") &&
                          col("khi") < col("cum_end"), col("v")))) / 2)
            .as(out))
      }
      val med = histMedian(ev, "value", "med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = histMedian(dev.select(col("event_type"), col("dev")),
                           "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             r6(max(col("med"))).as("med"),
             r6(max(col("mad"))).as("mad"),
             sum(when(col("dev") > lit(3.0) * col("mad"), 1L)
               .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // Event-type transition matrix (round 20) — the first-order Markov
    // model of user behavior (and the trajectory-statistics shape an
    // agent-log pipeline runs over action sequences): per user timeline,
    // each consecutive (current → next) event-type pair, aggregated to
    // transition counts and row-normalized probabilities in integer
    // micro. Ordering is total and CROSS-ENGINE SAFE: (user_id, ts) is
    // µs-unique in the fixture (checked at every SF) and ns→µs
    // truncation is monotone, so Spark's µs order and DuckDB's ns order
    // agree; event_id tiebreaks identically in both as belt-and-braces.
    // Scale shape at 100 TB: ONE user-keyed exchange for the lead()
    // window, then the pair count collapses onto the tiny |types|² key
    // space (map-side combinable) and the row totals are a broadcast of
    // ≤ |types| rows. Output ≤ |types|² rows at any corpus size.
    "q_events_markov" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tr = table(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
                col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("cur_type"), col("next_type"))
        .agg(count(lit(1)).as("n_trans"))
      val tot = tr.groupBy(col("cur_type"))
        .agg(sum(col("n_trans")).as("n_out"))
      tr.join(broadcast(tot), "cur_type")
        .select(col("cur_type"), col("next_type"), col("n_trans"),
          expr("(n_trans * 1000000) DIV n_out").as("p_micro"))
        .orderBy("cur_type", "next_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_events_markov" -> """
      WITH o AS (SELECT event_type,
                        lead(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                          AS next_type
                 FROM events),
      tr AS (SELECT event_type AS cur_type, next_type,
                    count(*) AS n_trans
             FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT cur_type, CAST(sum(n_trans) AS BIGINT) AS n_out
              FROM tr GROUP BY 1)
      SELECT tr.cur_type, tr.next_type,
             CAST(tr.n_trans AS BIGINT) AS n_trans,
             (tr.n_trans * 1000000) // tot.n_out AS p_micro
      FROM tr JOIN tot USING (cur_type)
      ORDER BY cur_type, next_type""",

    "q_funnel" -> """
      WITH su AS (SELECT user_id, min(ts) AS signup_ts FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      pu AS (SELECT user_id, ts AS pts FROM events
             WHERE event_type = 'purchase'),
      c AS (SELECT su.user_id, su.signup_ts, count(pu.pts) AS n_purch_7d
            FROM su LEFT JOIN pu
              ON su.user_id = pu.user_id
             AND pu.pts >= su.signup_ts
             AND pu.pts <= su.signup_ts + INTERVAL 7 DAY
            GROUP BY su.user_id, su.signup_ts)
      SELECT epoch_us(date_trunc('week', signup_ts)) AS cohort_week,
             count(*) AS n_signups,
             CAST(sum(CASE WHEN n_purch_7d > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converted,
             round(CAST(sum(CASE WHEN n_purch_7d > 0 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*), 6) AS conv_rate
      FROM c
      GROUP BY date_trunc('week', signup_ts)
      ORDER BY cohort_week""",

    "q_funnel_steps" -> """
      WITH v AS (SELECT user_id, min(ts) AS vts FROM events
                 WHERE event_type = 'view' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS cts FROM events e
            JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.vts
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS pts FROM events e
            JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.cts
            GROUP BY e.user_id)
      SELECT (SELECT count(*) FROM v) AS n_view,
             (SELECT count(*) FROM c) AS n_view_click,
             (SELECT count(*) FROM p) AS n_view_click_purchase""",

    "q_retention" -> """
      WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
                      FROM events GROUP BY user_id),
      active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
                 FROM events)
      SELECT epoch_us(cw) AS cohort_week,
             CAST(datediff('day', cw, aw) / 7 AS BIGINT) AS week_k,
             count(*) AS n_active
      FROM cohort JOIN active USING (user_id)
      GROUP BY cw, CAST(datediff('day', cw, aw) / 7 AS BIGINT)
      ORDER BY cohort_week, week_k""",

    "q_events_outliers" -> """
      WITH s AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
               CAST(sum(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE)
                 AS s2
        FROM events GROUP BY event_type),
      st AS (SELECT event_type, n, s1 / n AS mean,
                    sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
             FROM s),
      z AS (SELECT e.event_type, (e.value - st.mean) / st.sd AS z,
                   st.mean AS mean, st.sd AS sd
            FROM events e JOIN st USING (event_type))
      SELECT event_type, count(*) AS n,
             round(max(mean), 6) AS mean,
             round(max(sd), 6) AS sd,
             CAST(sum(CASE WHEN abs(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
             round(max(z), 6) AS max_z
      FROM z
      GROUP BY event_type
      ORDER BY event_type""",

    "q_streaks" -> """
      WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                    FROM events),
      r AS (SELECT user_id, day,
                   row_number() OVER (PARTITION BY user_id ORDER BY day)
                     AS rn
            FROM days)
      SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
             count(*) AS n_days
      FROM r
      GROUP BY user_id, day - CAST(rn AS INTEGER)
      ORDER BY user_id, streak_start""",

    "q_events_mad" -> """
      WITH ev AS (SELECT event_type, value FROM events
                  WHERE value IS NOT NULL AND NOT isnan(value)),
      h1 AS (SELECT event_type, value AS v, count(*) AS cnt
             FROM ev GROUP BY 1, 2),
      c1 AS (SELECT event_type, v, cnt,
                    sum(cnt) OVER (PARTITION BY event_type ORDER BY v)
                      AS cum_end,
                    sum(cnt) OVER (PARTITION BY event_type) AS n
             FROM h1),
      m1 AS (SELECT c1.event_type,
                    (max(CASE WHEN cum_end - cnt <= (n - 1) // 2
                               AND (n - 1) // 2 < cum_end THEN v END) +
                     max(CASE WHEN cum_end - cnt <= n // 2
                               AND n // 2 < cum_end THEN v END)) / 2 AS med
             FROM c1 GROUP BY 1),
      dv AS (SELECT ev.event_type, abs(ev.value - m1.med) AS dev, m1.med
             FROM ev JOIN m1 USING (event_type)),
      h2 AS (SELECT event_type, dev AS v, count(*) AS cnt
             FROM dv GROUP BY 1, 2),
      c2 AS (SELECT event_type, v, cnt,
                    sum(cnt) OVER (PARTITION BY event_type ORDER BY v)
                      AS cum_end,
                    sum(cnt) OVER (PARTITION BY event_type) AS n
             FROM h2),
      m2 AS (SELECT c2.event_type,
                    (max(CASE WHEN cum_end - cnt <= (n - 1) // 2
                               AND (n - 1) // 2 < cum_end THEN v END) +
                     max(CASE WHEN cum_end - cnt <= n // 2
                               AND n // 2 < cum_end THEN v END)) / 2 AS mad
             FROM c2 GROUP BY 1)
      SELECT dv.event_type, count(*) AS n,
             round(max(dv.med), 6) AS med,
             round(max(m2.mad), 6) AS mad,
             CAST(sum(CASE WHEN dv.dev > 3.0 * m2.mad THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_outliers
      FROM dv JOIN m2 USING (event_type)
      GROUP BY dv.event_type
      ORDER BY dv.event_type""",
  )
}
