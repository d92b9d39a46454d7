package graft.ops

import org.apache.spark.sql.functions._

/** Aggregation inventory (SURVEY.md §2.3). All double sums/averages go
  * through the exact-decimal policy in [[graft.ops]]; grouping-null rows
  * from ROLLUP/CUBE are ordered NULLS LAST explicitly on both engines
  * (Spark's bare asc is NULLS FIRST, DuckDB's is NULLS LAST —
  * SURVEY.md §2.1 A10). Partial (map-side) aggregation is automatic in
  * HashAggregateExec, so grouped aggs shuffle only one row per
  * (partition, group) at scale.
  */
object AggOps {

  val queries: Map[String, QB] = Map(
    "q_agg_global" -> ((s, d) =>
      table(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        dsum(col("l_quantity")).as("sum_qty"),
        r6(davg(col("l_quantity"))).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))),

    // TPC-H Q1 shape (multi-key group, mixed aggregates).
    "q_agg_groupby" -> ((s, d) =>
      spreadTable(s, d, "lineitem", col("l_extendedprice"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("l_extendedprice")).as("sum_base"),
             dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
               .as("sum_disc"),
             r6(davg(col("l_quantity"))).as("avg_qty"),
             r6(davg(col("l_discount"))).as("avg_disc"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q_agg_distinct" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
             countDistinct(col("l_suppkey")).as("nd_supp"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_agg_rollup" -> ((s, d) =>
      table(s, d, "customer")
        .join(broadcast(table(s, d, "nation")),
              col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_last("r_name"), asc_nulls_last("n_name"))),

    "q_agg_cube" -> ((s, d) =>
      table(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .cube(col("o_orderstatus"), col("o_year"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(asc_nulls_last("o_orderstatus"), asc_nulls_last("o_year"))),

    // Pivot: order counts per year spread across status columns. Explicit
    // value list pins the output schema; oracle uses FILTER-style
    // conditional aggregation (identical semantics, no dialect risk).
    "q_agg_pivot" -> ((s, d) =>
      table(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("o_year"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("O", "F", "P"))
        .orderBy("o_year")),

    // Fixed-width histogram via integer bucketing (floor division is
    // identical in both engines).
    "q_agg_histogram" -> ((s, d) =>
      table(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("long")
                   .as("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("o_totalprice")).as("lo"),
             max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")),

    // GROUPING SETS through the SQL surface (spark.sql + temp view) —
    // same Catalyst Expand as rollup/cube, exercising the SQL entry path.
    "q_agg_grouping_sets" -> ((s, d) => {
      table(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS o_year,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_year), ())
        ORDER BY o_orderstatus NULLS LAST, o_year NULLS LAST""")
    }),

    // Deterministic string aggregation: collect_list is order-free, so
    // sort_array pins the concatenation order on both engines.
    "q_agg_stringagg" -> ((s, d) =>
      table(s, d, "nation")
        .join(broadcast(table(s, d, "region")),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
               .as("nations"))
        .orderBy("r_name")),

    // Distinct array aggregation with pinned order (collect_set is
    // order-free; sort_array fixes it on both engines). Emitted as
    // comma-joined strings: array-typed result columns break the driver's
    // pandas hash compare, so both engines canonicalize to text.
    "q_agg_arrayagg" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",")
               .as("statuses"),
             array_join(transform(
               sort_array(collect_set(col("l_linenumber").cast("long"))),
               _.cast("string")), ",").as("linenos"))
        .orderBy("l_returnflag")),

    // Exact interpolated quantiles (quantile_cont semantics) by
    // ITERATIVE HISTOGRAM REFINEMENT — the distributed quickselect. Two
    // earlier spellings both hid a scale cliff: Spark's `percentile`
    // buffers a value→count map per group (executor-memory cliff on a
    // continuous column), and the (group, value)-counts + cumulative
    // window spelling sorts every DISTINCT value of a group in one task
    // (the key-shifted stress fixtures can't see it — copies repeat
    // values — but a real corpus's distinct count grows with the data).
    // Here no task ever holds more than one BUCKET:
    //   1. one narrow scan per target column builds a log-bucket
    //      histogram (bucket = floor(ln v · 64), monotone, needs no
    //      prior min/max pass; bucket-space ≤ ~91 K ids regardless of
    //      corpus size) with per-bucket count/min/max;
    //   2. each needed k-th order statistic is located in its bucket by
    //      a tiny-frame cumulative window; a single-valued bucket
    //      (mn == mx) resolves immediately;
    //   3. buckets still holding > 64 K rows are REFINED: one more scan
    //      filtered to those value ranges, equal-width 8192-way
    //      histogram inside each, relocate — each round divides the
    //      candidate set ~8192×, so two rounds cover ~10¹² rows/group
    //      (8 rounds hard cap, then a windowed in-range rank);
    //   4. one final scan extracts every survivor bracket's k-th value
    //      via conditional collect_list + array_sort (≤ 64 K doubles per
    //      bracket by construction).
    // The driver-side bracket loop holds O(groups × percentiles) rows
    // (≤ 18 here) — control decisions off tiny aggregates, the same
    // AQE-spirit adaptivity as the dedup contraction gate, valid because
    // this query's group key (l_returnflag) is low-cardinality. At
    // sf0.1 the loop takes zero refinement rounds: 2 histogram scans +
    // 1 extract scan, all codegen, no wide shuffle anywhere.
    "q_agg_percentile" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.Column
      val targets = Seq(("l_quantity", "p50", 0.5),
                        ("l_quantity", "p90", 0.9),
                        ("l_extendedprice", "p50_price", 0.5))
      val tcols = targets.map(_._1).distinct
      val li = table(s, d, "lineitem")
      val g = col("l_returnflag")
      val RefineB = 8192      // fan-out per refinement round
      val ExtractT = 65536L   // max rows one extract bracket may hold
      val MaxRounds = 8

      // Level-1 log bucketizer: monotone over all REAL doubles, no stats
      // pass needed. Offsets keep the three sign classes disjoint. NaN
      // falls through every branch to a NaN-derived bucket that would
      // corrupt the cumulative ordering, so NaNs are excluded from the
      // population everywhere (counts, histogram, extract) — the query
      // computes percentiles over non-null, non-NaN values.
      def logBucket(v: Column): Column =
        when(v > 0, floor(log(v) * 64) + 100000L)
          .when(v === 0, lit(0L))
          .otherwise(-floor(log(-v) * 64) - 100000L)
      def real(c: Column): Column = c.isNotNull && !isnan(c)

      // One bracket = one pending k-th order statistic (k is 0-based
      // WITHIN the bracket's value range [lo, hi]).
      case class Br(gv: String, cid: String, pname: String, role: String,
                    k: Long, lo: Double, hi: Double, cnt: Long)

      // Walk a collected histogram's cumulative counts on the driver
      // and locate each (partKey, k) in its bucket: returns (partKey,
      // k, bucketRank=k-cum_start, cnt, mn, mx) rows, ≤ |ks| of them.
      // The former distributed spelling paid a (pk)-window shuffle plus
      // a broadcast join + filter on a frame that is histogram-sized
      // anyway — the cum walk is O(buckets) driver arithmetic
      // (round 22, VERDICT r21 #8 / guide §1.2).
      def locateInHist(hist: Seq[(String, Long, Long, Double, Double)],
                       ks: Seq[(String, Long)])
          : Seq[(String, Long, Long, Long, Double, Double)] = {
        val byPk = hist.groupBy(_._1)
        ks.groupBy(_._1).toSeq.flatMap { case (pk, pkKs) =>
          val rows = byPk.getOrElse(pk, Nil).sortBy(_._2)
          var cum = 0L
          val out = scala.collection.mutable
            .ArrayBuffer[(String, Long, Long, Long, Double, Double)]()
          rows.foreach { case (_, _, cnt, mn, mx) =>
            val start = cum; cum += cnt
            pkKs.foreach { case (_, k) =>
              if (start <= k && k < cum)
                out += ((pk, k, k - start, cnt, mn, mx)) }
          }
          out
        }
      }
      // Histogram a column over a row predicate / partition key /
      // bucket expr, collected whole (bounded: the log-bucket id space
      // is ≤ ~91 K ids per (group, sign class) by construction and a
      // refinement range carries ≤ RefineB buckets — histogram-sized,
      // never corpus-sized), then locate on the driver. ONE corpus
      // scan regardless of bracket count, and the scan's partial
      // aggregate is now the plan's only exchange.
      def locate(cid: String, pred: Column, partOf: Column,
                 bucketOf: Column, ks: Seq[(String, Long)])
          : Seq[(String, Long, Long, Long, Double, Double)] = {
        val hist = li.filter(real(col(cid)) && pred)
          .groupBy(partOf.as("pk"), bucketOf.as("b"))
          .agg(count(lit(1)).as("cnt"), min(col(cid)).as("mn"),
               max(col(cid)).as("mx"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                     r.getDouble(3), r.getDouble(4))).toSeq
        locateInHist(hist, ks)
      }

      // Level-1 histograms for BOTH target columns plus per-group row
      // presence in ONE corpus scan (round 22, VERDICT r21 #8 — guide
      // §1.2 "how many passes are unavoidable"): the former shape paid
      // one count pass plus one locate pass per column (3 corpus scans
      // before the extract); here each row explodes into a presence
      // entry (cid '', counts every group even if all its target
      // values are null/NaN — the n=0 output row must survive) and one
      // entry per target column holding a real value, and the
      // groupBy's partial aggregation collapses the 3n exploded rows
      // map-side, so the exchange stays histogram-sized. The per-
      // (group, column) populations are the histogram's own bucket
      // sums — the same population by construction, so the k-ranks
      // cannot drift.
      val entries = array(
        struct(lit("").as("cid"), lit(0L).as("b"), lit(0.0).as("v"),
               lit(true).as("ok")) +:
        tcols.map(c => struct(lit(c).as("cid"), logBucket(col(c)).as("b"),
               col(c).cast("double").as("v"), real(col(c)).as("ok"))): _*)
      val l1: Seq[(String, String, Long, Long, Double, Double)] =
        li.select(g.as("pk"), explode(entries).as("e"))
          .filter(col("e.ok"))
          .groupBy(col("pk"), col("e.cid").as("cid"), col("e.b").as("b"))
          .agg(count(lit(1)).as("cnt"), min(col("e.v")).as("mn"),
               max(col("e.v")).as("mx"))
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                     r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
      val nOf: Map[(String, String), Long] =
        l1.filter(_._2.nonEmpty).groupBy(t => (t._1, t._2))
          .map { case (k, rows) => k -> rows.map(_._4).sum }
          .withDefaultValue(0L)
      val groups = l1.collect { case (pk, "", _, _, _, _) => pk }
        .distinct.sorted

      // Needed 0-based global ranks klo/khi per (group, target).
      val wanted: Seq[(String, String, String, String, Long)] =
        for {
          gv <- groups
          (cid, pname, p) <- targets
          n = nOf((gv, cid)) if n > 0
          pos = p * (n - 1)
          (role, k) <- Seq(("lo", math.floor(pos).toLong),
                           ("hi", math.ceil(pos).toLong))
        } yield (gv, cid, pname, role, k)

      // Level 1: locate every wanted k in the already-collected
      // log-bucket histogram (no further scan).
      var pending: Seq[Br] = tcols.flatMap { cid =>
        val ks = wanted.collect { case (gv, `cid`, _, _, k) => (gv, k) }
          .distinct
        if (ks.isEmpty) Nil
        else locateInHist(
          l1.collect { case (pk, `cid`, b, cnt, mn, mx) =>
            (pk, b, cnt, mn, mx) }, ks).flatMap {
          case (gv, k, kin, cnt, mn, mx) =>
            wanted.collect { case (wgv, `cid`, pname, role, wk)
                if wgv == gv && wk == k =>
              Br(gv, cid, pname, role, kin, mn, mx, cnt) }
        }
      }

      val resolved = scala.collection.mutable
        .ArrayBuffer[(String, String, String, Double)]() // gv,pname,role,v
      var roundNo = 0
      while (pending.nonEmpty && roundNo < MaxRounds) {
        roundNo += 1
        val (single, multi) = pending.partition(b => b.lo == b.hi)
        resolved ++= single.map(b => (b.gv, b.pname, b.role, b.lo))
        val (heavy, light0) = multi.partition(_.cnt > ExtractT)
        // Extract all light brackets in ONE scan: a conditional
        // collect_list + array_sort per bracket (bounded ≤ ExtractT).
        val light = light0.distinct
        if (light.nonEmpty) {
          val exprs = light.zipWithIndex.map { case (b, i) =>
            element_at(array_sort(collect_list(
              when(g === b.gv && col(b.cid).between(b.lo, b.hi),
                   col(b.cid)))), (b.k + 1).toInt).as(s"v$i") }
          // Pre-filter to the union of target ranges so the per-bracket
          // conditional aggregates evaluate on the ~n/B surviving rows,
          // not the whole corpus (measured: the 18-aggregate pass was
          // the extract scan's cost at 100×).
          val keep = light.map(b =>
            g === b.gv && col(b.cid).between(b.lo, b.hi)).reduce(_ || _)
          val row = li.filter(keep).agg(exprs.head, exprs.tail: _*)
            .collect()(0)
          light0.foreach { b =>
            val i = light.indexOf(b)
            resolved += ((b.gv, b.pname, b.role, row.getDouble(i)))
          }
        }
        // Refine heavy brackets: equal-width RefineB-way histogram
        // inside each value range, relocate k within it. All of a
        // column's ranges are batched into ONE scan via a CASE-derived
        // range id (ranges are disjoint by construction: each round's
        // brackets come from disjoint buckets of disjoint parents).
        if (heavy.nonEmpty)
          Console.err.println(
            s"[pct] refinement round $roundNo: ${heavy.size} brackets")
        pending = heavy.groupBy(_.cid).toSeq.flatMap { case (cid, brs) =>
          val ranges = brs.map(b => (b.gv, b.lo, b.hi)).distinct.zipWithIndex
          def cond(r: (String, Double, Double)) =
            g === r._1 && col(cid).between(r._2, r._3)
          val pred = ranges.map(x => cond(x._1)).reduce(_ || _)
          val partOf = ranges.foldRight(lit(null).cast("string")) {
            case ((r, i), acc) => when(cond(r), lit(i.toString)).otherwise(acc)
          }
          val bucketOf = ranges.foldRight(lit(null).cast("long")) {
            case ((r @ (_, lo, hi), _), acc) =>
              when(cond(r), least(floor((col(cid) - lo) / (hi - lo)
                * RefineB).cast("long"), lit(RefineB - 1L))).otherwise(acc)
          }
          val byRange = brs.groupBy(b => ranges.collectFirst {
            case (r, i) if r == ((b.gv, b.lo, b.hi)) => i }.get)
          val ks = byRange.toSeq.flatMap { case (i, bs) =>
            bs.map(b => (i.toString, b.k)) }.distinct
          locate(cid, pred, partOf, bucketOf, ks).flatMap {
            case (pk, k, kin, cnt, mn, mx) =>
              byRange(pk.toInt).collect { case b if b.k == k =>
                Br(b.gv, cid, b.pname, b.role, kin, mn, mx, cnt) }
          }
        }
      }
      // MaxRounds exhausted (adversarial value distribution): windowed
      // in-range rank — correct, single fat task per bracket, loud in
      // the plan rather than wrong.
      pending.foreach { b =>
        val v = li.filter(g === b.gv && col(b.cid).between(b.lo, b.hi))
          .select(col(b.cid).as("v"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(lit(1)).orderBy("v")))
          .filter(col("rn") === b.k + 1).collect()(0).getDouble(0)
        resolved += ((b.gv, b.pname, b.role, v))
      }

      // Assemble: the same interpolation arithmetic as before, run as a
      // Spark plan so rounding matches the engine (round = HALF_UP).
      val rmap = resolved.map(r => (r._1, r._2, r._3) -> r._4).toMap
      val outRows = for (gv <- groups) yield {
        val cells = targets.map { case (cid, pname, p) =>
          val n = nOf((gv, cid))
          if (n == 0) (pname, 0.0, 0.0, 0.0, false)
          else {
            val pos = p * (n - 1)
            val vlo = rmap((gv, pname, "lo"))
            val vhi = rmap.getOrElse((gv, pname, "hi"), vlo)
            (pname, pos, vlo, vhi, true)
          }
        }
        (gv, cells)
      }
      val flat = outRows.flatMap { case (gv, cells) =>
        cells.map { case (pname, pos, vlo, vhi, ok) =>
          (gv, pname, pos, vlo, vhi, ok) }
      }
      val vals = s.createDataFrame(flat)
        .toDF("l_returnflag", "pname", "pos", "vlo", "vhi", "ok")
        .withColumn("q", when(!col("ok"), lit(null).cast("double"))
          .otherwise(round(
            when(floor(col("pos")) === ceil(col("pos")), col("vlo"))
              .otherwise((ceil(col("pos")) - col("pos")) * col("vlo") +
                         (col("pos") - floor(col("pos"))) * col("vhi")),
            6)))
      val out = targets.map(_._2).foldLeft(
          vals.select(g).distinct()) { (df, pname) =>
        df.join(vals.filter(col("pname") === pname)
                  .select(g, col("q").as(pname)),
                Seq("l_returnflag"), "left")
      }
      out.select(g +: targets.map(t => col(t._2)): _*)
        .orderBy("l_returnflag")
    }),

    // Conditional aggregation: per-group counts/sums restricted by
    // predicates (count(CASE…) / sum(CASE…) — FILTER semantics).
    "q_agg_conditional" -> ((s, d) =>
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(when(col("l_quantity") > 25, 1)).as("n_heavy"),
             count(when(col("l_discount") === 0.0, 1)).as("n_nodisc"),
             dsum(when(col("l_quantity") > 25, col("l_extendedprice"))
               .otherwise(0.0)).as("heavy_revenue"))
        .orderBy("l_returnflag")),

    // Salted two-stage aggregation — the skew-mitigation pattern made
    // explicit: stage 1 pre-aggregates on (key, salt) so no single reducer
    // owns a hot key; stage 2 merges partials. Exact-decimal partials make
    // the result identical to the direct group-by, which is what the
    // oracle asserts (it IS the direct group-by).
    "q_agg_salted" -> ((s, d) => {
      val salted = table(s, d, "lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).as("psum"),
             count(lit(1)).as("pn"))
      salted.groupBy(col("l_returnflag"))
        .agg(sum(col("psum")).cast("double").as("revenue"),
             sum(col("pn")).as("n"))
        .orderBy("l_returnflag")
    }),

    // Statistical moments from exact INTEGER sums: var/stddev/corr from
    // (Σx², Σx, Σxy) moments combined in closed form — native
    // var_samp/corr accumulate doubles order-dependently and would not
    // cross-engine match. Like q_agg_regression, the moments accumulate
    // in exact (quantity, cents) integer units — quantity is
    // integer-valued and price 2-dp-valued, so every sum is an exact
    // DECIMAL(38,0) count that both engines reproduce bit-identically —
    // and only the final closed-form combination runs in double, spelled
    // identically in both engines (same ops in the same order ⇒ same
    // IEEE results). ~1.5× cheaper per row than the former
    // DECIMAL(38,6) accumulation (narrow decimal inputs), same
    // one-pass map-side-combined shuffle shape.
    "q_agg_stats" -> ((s, d) => {
      spreadTable(s, d, "lineitem", col("l_extendedprice"))
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,0)").as("qi"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("pc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("qi")).cast("decimal(38,0)").as("sxi"),
          sum((col("qi") * col("qi")).cast("decimal(38,0)")).as("sxxi"),
          sum(col("pc")).cast("decimal(38,0)").as("syi"),
          sum((col("pc") * col("pc")).cast("decimal(38,0)")).as("syyi"),
          sum((col("qi") * col("pc")).cast("decimal(38,0)")).as("sxyi"))
        .select(col("l_returnflag"), col("n"),
          col("sxi").cast("double").as("sx"),
          col("sxxi").cast("double").as("sxx"),
          (col("syi").cast("double") / 100).as("sy"),
          (col("syyi").cast("double") / 10000).as("syy"),
          (col("sxyi").cast("double") / 100).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          r6((col("sxx") - col("sx") * col("sx") / col("n")) /
             (col("n") - 1)).as("var_qty"),
          r6(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
             (col("n") - 1))).as("std_qty"),
          r6((col("sxy") - col("sx") * col("sy") / col("n")) /
             (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // KMV (k-minimum-values) distinct sketch with k=64 over the md5-derived
    // hash — unlike HLL, fully deterministic and cross-engine exact, so the
    // sketch itself is oracle-verified. Estimator: D̂ = (k-1) / h_k where
    // h_k is the k-th smallest hash normalized to (0,1]. The per-group
    // k-smallest is a typed Aggregator (graft.functions.KMinAgg) with a
    // bounded sorted buffer: map-side partial aggregation keeps ≤k longs
    // per (partition, group), the shuffle moves sketches not values, and
    // no global sort or distinct pass ever materializes the full distinct
    // set (dedup happens inside the sketch).
    "q_agg_kmv_sketch" -> ((s, d) => {
      val k = 64
      val kmin = udaf(new graft.functions.KMinAgg(k),
        org.apache.spark.sql.Encoders.scalaLong)
      table(s, d, "events")
        .select(col("event_type"),
          md5hash32(col("user_id").cast("string")).as("h"))
        .filter(col("h").isNotNull)
        .groupBy(col("event_type"))
        .agg(kmin(col("h")).as("mins"))
        .select(col("event_type"),
          size(col("mins")).cast("long").as("kept"),
          // h_k = 0 guard mirrors the oracle's nullif(..., 0) → NULL
          // (not Infinity) when the only distinct hash is zero.
          when(element_at(col("mins"), -1) =!= 0,
            r6(lit(k - 1) /
               (element_at(col("mins"), -1).cast("double") /
                lit(4294967296.0)))).as("est_distinct"))
        .orderBy("event_type")
    }),

    // Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter audit:
    // a depth-4 × width-256 sketch of the l_partkey frequency stream,
    // read back at the top-20 true-frequency keys. Deterministic hash
    // rows (md5 of "row:key" mod width — identical in both engines, no
    // RNG) make the whole sketch oracle-matchable as plain SQL, unlike
    // the engine-private HLL above. The output carries truth AND
    // estimate, so the CM one-sided error guarantee (est >= true, with
    // overcount bounded by the depth-min of row collisions) is visible
    // in the artifact, not asserted.
    //
    // Scale posture: the sketch build is one linear ×4 explode shuffled
    // into 1024 cells (a map-side-combinable HashAggregate — at 100 TB
    // the partial aggregation collapses each task's stream to <= 1024
    // rows before the exchange, so the shuffle is O(tasks), not O(rows));
    // the probe side is a 20-row TakeOrdered broadcast. This is the
    // pre-aggregation shape a pipeline uses to find hot keys without a
    // full groupBy when the key space is huge.
    "q_agg_countmin" -> ((s, d) => {
      val keys = table(s, d, "lineitem")
        .select(col("l_partkey").cast("long").as("k"))
      // All 4 row-hashes come from ONE md5 digest per key — its 32 hex
      // chars split into 4 disjoint 8-char (32-bit) slices, each an
      // independent uniform hash (the native cmBucketsFast expression,
      // shared with the streaming sketch whose oracle is the
      // batch==stream identity; the HOF cmBuckets spelling stays as the
      // reference CmBucketsSpec compares). One digest per row inside
      // whole-stage codegen is the difference between the sketch build
      // being hash-bound and scan-bound at corpus scale.
      def buckets = posexplode(cmBucketsFast(col("k")))
      val cells = keys
        .select(buckets)
        .select(col("pos").as("r"), col("col").as("b"))
        .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
      val top = keys.groupBy(col("k")).agg(count(lit(1)).as("c_true"))
        .orderBy(col("c_true").desc, col("k")).limit(20)
      top.select(col("k"), col("c_true"), buckets)
        .select(col("k"), col("c_true"), col("pos").as("r"),
                col("col").as("b"))
        .join(cells, Seq("r", "b"))
        .groupBy(col("k"), col("c_true"))
        .agg(min(col("c")).as("c_est"))
        .select(col("k"), col("c_true"), col("c_est"),
                (col("c_est") - col("c_true")).as("overcount"))
        .orderBy(col("c_true").desc, col("k"))
    }),

    // HLL sketch — bench-only (sketches are engine-specific, SURVEY §2.3),
    // so no oracle entry: the driver records a rows-only check.
    "q_agg_approx_distinct" -> ((s, d) =>
      table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // arg-max/arg-min (SQL max_by/min_by): the value of one column at
    // another column's extremum. Spark plans max_by — and max(struct(...))
    // — as SortAggregate, because a string-bearing aggregation buffer is
    // not mutable fixed-width; at 100 TB that is a per-partition sort of
    // the whole fact table. Re-expressed as the scalable argmax shape:
    // (1) a pure-BIGINT extremum aggregate (codegen HashAggregate, map-side
    // combinable), then (2) broadcast join-backs on the tiny per-group
    // extremum frame to fetch the string/double payloads — one exact match
    // per group because the ordering column o_orderkey is UNIQUE (max_by on
    // a tied ordering is nondeterministic in BOTH engines, so tie-free
    // ordering is part of this operator's determinism contract).
    "q_agg_minmax_by" -> ((s, d) => {
      val o = table(s, d, "orders")
      val ext = o.groupBy(col("o_orderstatus"))
        .agg(max(col("o_orderkey")).as("max_key"),
             min(col("o_orderkey")).as("min_key"))
      val atMax = o.join(
          broadcast(ext.select(col("o_orderstatus").as("xs"), col("max_key"))),
          col("o_orderkey") === col("max_key"))
        .select(col("xs"), col("o_orderpriority").as("latest_priority"),
                r6(col("o_totalprice")).as("latest_price"))
      val atMin = o.join(
          broadcast(ext.select(col("o_orderstatus").as("ns"), col("min_key"))),
          col("o_orderkey") === col("min_key"))
        .select(col("ns"), col("o_orderpriority").as("first_priority"))
      ext.join(broadcast(atMax), col("o_orderstatus") === col("xs"))
        .join(broadcast(atMin), col("o_orderstatus") === col("ns"))
        .select(col("o_orderstatus"), col("latest_priority"),
                col("first_priority"), col("max_key"), col("min_key"),
                col("latest_price"))
        .orderBy("o_orderstatus")
    }),

    // Mode (most frequent value) per group, ties broken by the smaller
    // value — count-then-rank, both shuffles keyed on the group (the
    // rank window partitions on it, so no single-reducer sort).
    "q_agg_mode" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      table(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderstatus"))
            .orderBy(col("n").desc, col("o_orderpriority"))))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"),
                col("o_orderpriority").as("mode_priority"), col("n"))
        .orderBy("o_orderstatus")
    }),

    // Linear regression (the SQL regr_* family: covariance, OLS slope /
    // intercept, R²) from exact INTEGER moments: quantity is
    // integer-valued and price 2-dp-valued, so the five sums are exact
    // DECIMAL(38,0) accumulations in (qty, cents) units — one
    // map-side-combined pass, order-independent, bit-identical in both
    // engines while |numi| stays under DECIMAL(38)'s ceiling: the
    // binding bound is the rounding step's numi·2e6 < 10^38, i.e.
    // |numi| ≲ 5·10^31 (a 100 TB corpus sits near 10^28); past it
    // Spark's non-ANSI decimal arithmetic returns NULL silently while
    // DuckDB HUGEINT fails loudly — the engines would disagree
    // loudly-vs-silently, never value-vs-value. cov_samp and slope are
    // pure integer formulas, rounded to 6 dp with an explicit half-up
    // integer division — the 10× sweep caught group A's cov_samp
    // landing 5e-7 from the .5 boundary, where the former
    // double-pipeline round() flipped the last digit between engines.
    // Degenerate groups are guarded explicitly: ni = 1 makes cdeni = 0
    // and a constant-quantity group makes denxi = 0 — zero divisors,
    // where the engines diverge (ANSI-default Spark 4 raises
    // DIVIDE_BY_ZERO; DuckDB yields NULL for both / and //). Both
    // engines now emit NULL via the same CASE (cov_samp of a 1-row
    // group and the slope over zero x-variance are undefined); locked
    // by RegressionGuardSpec.
    // intercept and R² keep the double spelling over CASTs of the same
    // exact sums (their exact integer forms need sy·denx / num²
    // intermediates past DECIMAL(38) / INT128 at corpus scale); their
    // inputs are identical in both engines, leaving only the same
    // documented round()-boundary residual the other three no longer
    // have. Never regr_slope/covar_samp(double) directly: their
    // running-update order differs between engines.
    "q_agg_regression" -> ((s, d) =>
      spreadTable(s, d, "lineitem", col("l_extendedprice"))
        .select(col("l_returnflag"),
          col("l_quantity").cast("decimal(18,0)").as("qi"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("decimal(18,0)").as("pc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("ni"),
          sum(col("qi")).cast("decimal(38,0)").as("sxi"),
          sum(col("pc")).cast("decimal(38,0)").as("syi"),
          sum((col("qi") * col("pc")).cast("decimal(38,0)")).as("sxyi"),
          sum((col("qi") * col("qi")).cast("decimal(38,0)")).as("sxxi"),
          sum((col("pc") * col("pc")).cast("decimal(38,0)")).as("syyi"))
        .select(col("l_returnflag"),
          (col("ni") * col("sxyi") - col("sxi") * col("syi")).as("numi"),
          (col("ni") * col("sxxi") - col("sxi") * col("sxi")).as("denxi"),
          (col("ni") * (col("ni") - lit(1)) * 100).as("cdeni"),
          col("ni").cast("double").as("n"),
          col("sxi").cast("double").as("sx"),
          (col("syi").cast("double") / 100).as("sy"),
          (col("sxyi").cast("double") / 100).as("sxy"),
          col("sxxi").cast("double").as("sxx"),
          (col("syyi").cast("double") / 10000).as("syy"))
        .selectExpr("l_returnflag",
          // round(numi/cdeni, 6) half-up away from zero, all integer:
          // floor((|numi|·10⁶·2 + den) / (2·den)), sign re-applied.
          """CAST(CASE WHEN cdeni = 0 THEN NULL
               WHEN numi >= 0
               THEN (numi * 2000000 + cdeni) DIV (2 * cdeni)
               ELSE -((-numi * 2000000 + cdeni) DIV (2 * cdeni)) END
             AS DOUBLE) / 1e6 AS cov_samp""",
          // slope = numi / (100·denxi), same exact rounding.
          """CAST(CASE WHEN denxi = 0 THEN NULL
               WHEN numi >= 0
               THEN (numi * 2000000 + 100 * denxi) DIV (200 * denxi)
               ELSE -((-numi * 2000000 + 100 * denxi) DIV (200 * denxi)) END
             AS DOUBLE) / 1e6 AS slope""",
          // intercept/r2 guards: ANSI Spark raises on ANY numeric
          // division by zero where DuckDB yields NULL — the same CASE
          // pins both engines to NULL on zero x-variance (and, for r2,
          // zero y-variance; the double compare is engine-identical
          // because both compute it from the same exact integer sums).
          """CASE WHEN denxi = 0 THEN CAST(NULL AS DOUBLE) ELSE
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) END AS intercept""",
          """CASE WHEN denxi = 0 OR n * syy - sy * sy = 0.0
               THEN CAST(NULL AS DOUBLE) ELSE
               round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
                     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             END AS r2""")
        .orderBy("l_returnflag")),
  )

  val oracles: Map[String, String] = Map(
    // Golden pin (not a derivation — see GoldenOracles): HLL++ is
    // partitioning-independent, so the sf0.01 estimates are stable.
    "q_agg_approx_distinct" -> GoldenOracles.approxDistinctSql,

    "q_agg_global" -> """
      SELECT count(*) AS n,
             min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / count(l_quantity), 6) AS avg_qty,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price
      FROM lineitem""",

    "q_agg_groupby" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                   / count(l_quantity), 6) AS avg_qty,
             round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
                   / count(l_discount), 6) AS avg_disc,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q_agg_rollup" -> """
      SELECT r_name, n_name, count(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS LAST, n_name NULLS LAST""",

    "q_agg_stats" -> """
      WITH i AS (
        SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,0)) AS qi,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS DECIMAL(18,0)) AS pc
        FROM lineitem),
      m AS (
        SELECT l_returnflag, count(*) AS n,
               CAST(sum(qi) AS DOUBLE) AS sx,
               CAST(sum(qi * qi) AS DOUBLE) AS sxx,
               CAST(sum(pc) AS DOUBLE) / 100 AS sy,
               CAST(sum(pc * pc) AS DOUBLE) / 10000 AS syy,
               CAST(sum(qi * pc) AS DOUBLE) / 100 AS sxy
        FROM i GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             round((sxx - sx * sx / n) / nullif(n - 1, 0), 6) AS var_qty,
             round(sqrt((sxx - sx * sx / n) / nullif(n - 1, 0)), 6) AS std_qty,
             round((sxy - sx * sy / n) /
                   nullif(sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n),
                          0), 6)
               AS corr_qty_price
      FROM m
      ORDER BY l_returnflag""",

    "q_agg_kmv_sketch" -> """
      WITH h AS (SELECT DISTINCT event_type,
                        CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 8)) AS BIGINT) AS h
                 FROM events),
      r AS (SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                     AS rn
            FROM h)
      SELECT event_type, count(*) AS kept,
             round(63 / nullif(CAST(max(h) AS DOUBLE) / 4294967296.0, 0), 6)
               AS est_distinct
      FROM r
      WHERE rn <= 64
      GROUP BY event_type
      ORDER BY event_type""",

    "q_agg_countmin" -> """
      WITH kk AS (SELECT CAST(l_partkey AS BIGINT) AS k,
                         md5(CAST(l_partkey AS BIGINT)::VARCHAR) AS hx
                  FROM lineitem),
      e AS (SELECT k, unnest([0, 1, 2, 3]) AS r, hx FROM kk),
      cells AS (SELECT r,
                       CAST(('0x' || substr(hx, r * 8 + 1, 8)) AS BIGINT)
                         % 256 AS b,
                       count(*) AS c
                FROM e GROUP BY 1, 2),
      top AS (SELECT k, count(*) AS c_true FROM kk GROUP BY k
              ORDER BY c_true DESC, k LIMIT 20),
      probe AS (SELECT k, c_true, unnest([0, 1, 2, 3]) AS r,
                       md5(k::VARCHAR) AS hx
                FROM top),
      pb AS (SELECT k, c_true, r,
                    CAST(('0x' || substr(hx, r * 8 + 1, 8)) AS BIGINT)
                      % 256 AS b
             FROM probe),
      est AS (SELECT pb.k, pb.c_true, min(cells.c) AS c_est
              FROM pb JOIN cells ON pb.r = cells.r AND pb.b = cells.b
              GROUP BY pb.k, pb.c_true)
      SELECT k, c_true, c_est, c_est - c_true AS overcount
      FROM est
      ORDER BY c_true DESC, k""",

    "q_agg_conditional" -> """
      SELECT l_returnflag,
             count(*) FILTER (l_quantity > 25) AS n_heavy,
             count(*) FILTER (l_discount = 0.0) AS n_nodisc,
             CAST(sum(CAST(CASE WHEN l_quantity > 25 THEN l_extendedprice
                                ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
               AS heavy_revenue
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q_agg_salted" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS revenue,
             count(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q_agg_pivot" -> """
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             count(*) FILTER (o_orderstatus = 'O') AS "O",
             count(*) FILTER (o_orderstatus = 'F') AS "F",
             count(*) FILTER (o_orderstatus = 'P') AS "P"
      FROM orders
      GROUP BY CAST(year(o_orderdate) AS BIGINT)
      ORDER BY o_year""",

    "q_agg_histogram" -> """
      SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders
      GROUP BY CAST(floor(o_totalprice / 50000.0) AS BIGINT)
      ORDER BY bucket""",

    "q_agg_grouping_sets" -> """
      SELECT o_orderstatus, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_year), ())
      ORDER BY o_orderstatus NULLS LAST, o_year NULLS LAST""",

    "q_agg_stringagg" -> """
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
      ORDER BY r_name""",

    "q_agg_arrayagg" -> """
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
               AS statuses,
             array_to_string(list_transform(
               list_sort(list(DISTINCT CAST(l_linenumber AS BIGINT))),
               x -> CAST(x AS VARCHAR)), ',') AS linenos
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    // The per-aggregate NaN FILTERs mirror the Spark side's real()
    // population (non-null, non-NaN per COLUMN): without them a single
    // NaN would enter DuckDB's sort (NaN orders last) while Spark's
    // histogram walk excludes it — a latent population divergence even
    // though the shipped fixtures carry no NaNs.
    "q_agg_percentile" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5)
                   FILTER (WHERE NOT isnan(l_quantity)), 6) AS p50,
             round(quantile_cont(l_quantity, 0.9)
                   FILTER (WHERE NOT isnan(l_quantity)), 6) AS p90,
             round(quantile_cont(l_extendedprice, 0.5)
                   FILTER (WHERE NOT isnan(l_extendedprice)), 6)
               AS p50_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q_agg_cube" -> """
      SELECT o_orderstatus, year(o_orderdate) AS o_year, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE(o_orderstatus, year(o_orderdate))
      ORDER BY o_orderstatus NULLS LAST, o_year NULLS LAST""",

    "q_agg_minmax_by" -> """
      SELECT o_orderstatus,
             arg_max(o_orderpriority, o_orderkey) AS latest_priority,
             arg_min(o_orderpriority, o_orderkey) AS first_priority,
             max(o_orderkey) AS max_key, min(o_orderkey) AS min_key,
             round(arg_max(o_totalprice, o_orderkey), 6) AS latest_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "q_agg_mode" -> """
      WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
                 FROM orders GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
              ORDER BY n DESC, o_orderpriority) AS rn FROM c)
      SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      FROM r WHERE rn = 1 ORDER BY o_orderstatus""",

    // Integer moments in (qty, cents) units as HUGEINT (DuckDB's exact
    // INT128 — DECIMAL(38)×DECIMAL(38) does not bind there); the Spark
    // side holds the same values in DECIMAL(38,0). cov_samp/slope use
    // the identical half-up integer division; intercept/r2 the identical
    // double formula over CASTs of the same exact sums.
    "q_agg_regression" -> """
      WITH m AS (SELECT l_returnflag,
        CAST(count(*) AS HUGEINT) AS ni,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,0))) AS HUGEINT) AS sxi,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS DECIMAL(18,0))) AS HUGEINT) AS syi,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,0))
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS DECIMAL(18,0))) AS HUGEINT) AS sxyi,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,0))
                 * CAST(l_quantity AS DECIMAL(18,0))) AS HUGEINT) AS sxxi,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                      AS DECIMAL(18,0))
                 * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS DECIMAL(18,0))) AS HUGEINT) AS syyi
        FROM lineitem GROUP BY l_returnflag),
      m2 AS (SELECT l_returnflag,
        ni * sxyi - sxi * syi AS numi,
        ni * sxxi - sxi * sxi AS denxi,
        ni * (ni - 1) * 100 AS cdeni,
        CAST(ni AS DOUBLE) AS n, CAST(sxi AS DOUBLE) AS sx,
        CAST(syi AS DOUBLE) / 100 AS sy,
        CAST(sxyi AS DOUBLE) / 100 AS sxy,
        CAST(sxxi AS DOUBLE) AS sxx,
        CAST(syyi AS DOUBLE) / 10000 AS syy
        FROM m)
      SELECT l_returnflag,
             CAST(CASE WHEN cdeni = 0 THEN NULL
               WHEN numi >= 0
               THEN (numi * 2000000 + cdeni) // (2 * cdeni)
               ELSE -((-numi * 2000000 + cdeni) // (2 * cdeni)) END
               AS DOUBLE) / 1e6 AS cov_samp,
             CAST(CASE WHEN denxi = 0 THEN NULL
               WHEN numi >= 0
               THEN (numi * 2000000 + 100 * denxi) // (200 * denxi)
               ELSE -((-numi * 2000000 + 100 * denxi) // (200 * denxi)) END
               AS DOUBLE) / 1e6 AS slope,
             CASE WHEN denxi = 0 THEN NULL ELSE
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) END AS intercept,
             CASE WHEN denxi = 0 OR n * syy - sy * sy = 0.0 THEN NULL ELSE
               round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
                     ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
             END AS r2
      FROM m2 ORDER BY l_returnflag""",
  )
}
