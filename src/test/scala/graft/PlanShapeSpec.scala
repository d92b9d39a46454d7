package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression lock for the whole inventory (the Tier-B scale
  * properties VERDICT audits by hand each round, frozen as a test):
  * building every query's physical plan at sf0.001 must produce
  *   - no CartesianProduct anywhere (an all-pairs join at 100 TB);
  *   - no SortAggregate (a non-fixed-width agg buffer demotes the whole
  *     aggregation out of codegen HashAggregate — the q_agg_minmax_by
  *     regression class);
  *   - BroadcastNestedLoopJoin only where a ONE-ROW frame is attached
  *     (the documented scalar-attach pattern: bloom bitmap, corpus
  *     totals, ndocs scalars) — never between two data-sized inputs.
  * q_stream_* builders run their micro-batch harness on build and
  * return a drained memory-sink frame whose "plan" is a local scan —
  * nothing to audit, so they are excluded. A few dedup builders run
  * their iterative label propagation on build; at sf0.001 that is
  * cheap, and their FINAL frame's plan is exactly what is audited.
  */
class PlanShapeSpec extends SparkTestBase {

  // The scalar-attach allowlist: queries that crossJoin(broadcast(1-row)).
  // A BroadcastNestedLoopJoin over one row is a constant-attach, not a
  // join pathology; anything NOT listed here must have none at all.
  private val oneRowAttach = Set(
    "q_join_bloom",         // broadcast bloom bitmap (1 row)
    "q_join_theta",         // 4-row constant band list (the theta demo)
    "q_text_tfidf",         // broadcast ndocs scalar
    "q_text_surprisal",     // broadcast corpus token total
    "q_dedup_minhash_eval", // audit ratios over 1-row counts
    "q_subquery_scalar",    // scalar subquery attach
    "q_tpch_q22",           // broadcast global avg-balance scalar (1 row)
    "q_tpch_q15",           // broadcast max-revenue scalar (1 row)
    "q_tpch_q11",           // broadcast nation-total scalar (1 row)
    "q_mix_weighted",       // per-source target share scalar
    "q_events_outliers",    // global robust-stats scalar
    "q_dedup_ngram_capped", // broadcast adaptive-cap threshold T (1 row)
    "q_sim_search", "q_sim_search_lsh", "q_sim_search_ivf",
    "q_knn_join")           // broadcast query vector / centroid set

  test("no query plans a CartesianProduct or SortAggregate; BNLJ only on scalar attaches") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("q_stream_")).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf0001).queryExecution
            .explainString(ExplainMode.fromString("formatted"))
          val bad = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "SortAggregate" -> plan.contains("SortAggregate"),
            "BroadcastNestedLoopJoin" ->
              (plan.contains("BroadcastNestedLoopJoin") &&
               !oneRowAttach.contains(name))
          ).collect { case (op, true) => op }
          if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
        } catch {
          // A builder that cannot PLAN is a failure of this audit, not a
          // skip: a silent catch-all here once masked broken builders
          // entirely (they'd dodge the CartesianProduct/SortAggregate
          // checks). Streaming builders are already excluded by name
          // above; nothing left in the inventory may throw.
          case e: Throwable =>
            Some(s"$name: threw during planning — ${e.toString.take(120)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
