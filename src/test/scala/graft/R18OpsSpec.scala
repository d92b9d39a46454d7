package graft

/** Laws for the round-18 additions: the production-geometry (2^21
  * buckets) classifier variant is re-derived by an in-memory brute
  * force on sf0.001 — independent of both the Spark plan and the DuckDB
  * oracle spelling — and its weight table must ride the BUILD side of a
  * broadcast hash join (the model-deployment plan shape the query
  * exists to demonstrate; a shuffle join here would re-exchange the
  * corpus-sized feature explode against a 2 M-row table). */
class R18OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("quality_classifier_2m matches a brute-force 2^21-bucket scorer") {
    val nb = ops.TextOps.QcBuckets2m
    assert(nb == (1L << 21))
    val docs = ops.table(spark, sf0001, "documents")
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val expect = docs.map { case (id, text) =>
      val tok = text.toLowerCase.split(" ", -1)
      // Same fastText word-hash combination as the 64-bucket law
      val hs = tok.toSeq.map(t =>
        java.lang.Long.parseLong(md5hex(t).take(8), 16))
      val buckets = hs.map(_ % nb) ++
        (if (hs.length >= 2)
           hs.sliding(2).map(p => (p(0) * 116049371L + p(1)) % nb).toSeq
         else Nil)
      val ws = buckets.map(b => 500000L + (b * 2654435761L) % 1000001L)
      val score = ws.sum / ws.size // non-negative: truncate == floor
      (id, ws.size.toLong, score,
       if (score >= 1000000L) "keep" else "drop")
    }.sortBy(_._1).toSeq
    val got = ops.TextOps.queries("q_quality_classifier_2m")(spark, sf0001)
      .select($"doc_id".as[Long], $"n_feats".as[Long],
              $"score_micro".as[Long], $"label".as[String])
      .collect().toSeq
    assert(got == expect)
    val labels = got.map(_._4).toSet
    assert(labels == Set("keep", "drop"),
      s"degenerate label split: $labels")
  }

  test("stream_topk: O(sketch) stream state and batch-identical answer") {
    graft.streaming.StreamOps.takeStateMetrics() // drop any residue
    // builder runs the stream eagerly; the returned frame is the view
    val df = graft.streaming.StreamOps.queries("q_stream_topk")(
      spark, sf0001)
    val st = graft.streaming.StreamOps.takeStateMetrics()
    assert(st.exists(_._1 <= 1024L),
      s"stream state should be the <=1024-cell sketch, got $st")
    // brute-force identity: exact top-10 among keys >= 1.2x mean rate —
    // the sketch prune must be invisible in the answer (CM only
    // overestimates, so no true heavy hitter can be pruned)
    val ev = ops.table(spark, sf0001, "events")
      .select($"user_id".as[Long]).collect().toSeq
    val counts = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = ev.size.toLong
    val users = counts.size.toLong
    val expect = counts.toSeq
      .filter { case (_, n) => n * users * 10 >= total * 12 }
      .sortBy { case (u, n) => (-n, u) }.take(10)
    val got = df.select($"user_id".as[Long], $"n".as[Long]).collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty, "degenerate fixture: no heavy hitters")
  }

  test("sample_weighted matches a brute-force PPS Bernoulli selection") {
    val docs = ops.table(spark, sf0001, "documents")
      .select($"doc_id".as[Long], $"n_chars".as[Long]).collect().toSeq
    val total = docs.map(_._2).sum
    val expect = docs.flatMap { case (id, nc) =>
      val pm = nc * 100000000L / total
      val u = java.lang.Long.parseLong(md5hex(s"ws:$id").take(8), 16) %
        1000000L
      if (u < pm) Some((id, nc, pm, u)) else None
    }.sortBy(_._1)
    val got = ops.PipelineOps.queries("q_sample_weighted")(spark, sf0001)
      .select($"doc_id".as[Long], $"n_chars".as[Long],
              $"pm".as[Long], $"u".as[Long]).collect().toSeq
    assert(got == expect)
    // selection is live: neither empty nor the whole corpus
    assert(got.nonEmpty && got.size < docs.size,
      s"degenerate selection: ${got.size} of ${docs.size}")
  }

  test("text_coverage matches a brute-force cumulative Zipf walk") {
    val docs = ops.table(spark, sf0001, "documents")
      .select($"text".as[String]).collect()
    val counts = docs.flatMap(_.split(" ", -1)).groupBy(identity)
      .map { case (t, xs) => (t, xs.length.toLong) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).drop(1)
    val expect = Seq(50L, 90L, 99L).map { p =>
      val idx = cums.indexWhere(c => c * 100 >= p * total)
      (p, idx + 1L, total)
    }
    val got = ops.TextOps.queries("q_text_coverage")(spark, sf0001)
      .select($"p_pct".as[Long], $"types_needed".as[Long],
              $"total_tokens".as[Long]).collect().toSeq
    assert(got == expect)
    // the curve is non-trivial on this corpus
    assert(expect.map(_._2).distinct.size > 1,
      s"degenerate coverage curve: $expect")
  }

  test("embed_outliers matches a brute-force centroid-distance top-20") {
    val vecs = ops.table(spark, sf0001, "embeddings")
      .select($"vec_id".as[Long], $"label".as[Int],
              $"embedding".as[Seq[Float]]).collect().toSeq
    val n = vecs.size
    val dim = vecs.head._3.length
    val cent = (0 until dim).map { i =>
      // dsum/davg replication: per-value HALF_UP decimal(·,6) cast,
      // exact decimal sum, decimal->double, double / count
      vecs.map(v => BigDecimal(v._3(i).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
    }
    val expect = vecs.map { case (id, label, v) =>
      var acc = 0.0
      var i = 0
      while (i < dim) { // sq_l2's element-order double fold
        val d = v(i).toDouble - cent(i); acc += d * d; i += 1
      }
      (id, label,
       BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
         .toDouble)
    }.sortBy { case (id, _, d2) => (-d2, id) }.take(20)
    val got = ops.SimOps.queries("q_embed_outliers")(spark, sf0001)
      .select($"vec_id".as[Long], $"label".as[Int], $"dist2".as[Double])
      .collect().toSeq
    assert(got == expect)
  }

  test("quality_classifier_2m's weight table rides a broadcast hash join") {
    val df = ops.TextOps.queries("q_quality_classifier_2m")(spark, sf0001)
    // collect() executes THIS Dataset's own queryExecution, so the
    // AdaptiveSparkPlanExec below reports the join it actually RAN; a
    // write would spawn a separate QueryExecution and leave this one
    // holding only the initial (pre-runtime) plan (r18 review). The
    // assertion reads the rendered plan because the final AQE tree
    // wraps executed subtrees in leaf QueryStageExec nodes a children
    // traversal does not descend into — the join sits inside a stage.
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    assert(plan.contains("BroadcastHashJoin"),
      "expected the 2M-bucket weight table on a BroadcastHashJoin; got:\n" +
        plan.take(4000))
    // the weight join is the query's ONLY join — it must never shuffle
    assert(!plan.contains("SortMergeJoin") &&
           !plan.contains("ShuffledHashJoin"),
      "the weight join must not shuffle the feature explode:\n" +
        plan.take(4000))
  }
}
