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
