package graft

import org.apache.spark.sql.catalyst.optimizer.BuildLeft
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{ExplainMode, SparkPlan}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Plan-shape regression lock for the whole inventory (the Tier-B scale
  * properties VERDICT audits by hand each round, frozen as a test):
  * building every query's physical plan at sf0.001 must produce
  *   - no CartesianProduct anywhere (an all-pairs join at 100 TB);
  *   - no SortAggregate (a non-fixed-width agg buffer demotes the whole
  *     aggregation out of codegen HashAggregate — the q_agg_minmax_by
  *     regression class);
  *   - BroadcastNestedLoopJoin only where a CONSTANT-BOUNDED frame is
  *     attached (the documented scalar-attach pattern: bloom bitmap,
  *     corpus totals, ndocs scalars, the theta demo's 4-row band list)
  *     — never between two data-sized inputs.
  * The attach check is STRUCTURAL (round 14; a name allowlist rots as
  * the inventory grows): every BNLJ's build side must trace to a
  * logical subtree whose exact `maxRows` bound is ≤ [[AttachBound]] —
  * a global aggregate is Some(1), an inline band table Some(4), a scan
  * is None and fails. The bound is independent of data and fixture
  * drift, so a future data-sized BNLJ cannot hide behind its query's
  * name having once been legitimate.
  * q_stream_* builders run their micro-batch harness on build and
  * return a drained memory-sink frame whose "plan" is a local scan —
  * nothing to audit, so they are excluded. A few dedup builders run
  * their iterative label propagation on build; at sf0.001 that is
  * cheap, and their FINAL frame's plan is exactly what is audited.
  */
class PlanShapeSpec extends SparkTestBase {

  /** Max rows a BNLJ build side may be PROVABLY bounded to. The largest
    * legitimate attach today is the theta demo's 4-row inline band
    * list; 8 leaves headroom for small constant tables while staying
    * far under anything data-shaped (whose maxRows is None anyway). */
  private val AttachBound = 8L

  /** The logical subtree backing a physical node: the node's own
    * logicalLink, else the link of its nearest descendant through
    * SINGLE-child wrappers (exchanges, projections). Multi-child nodes
    * without a link stay None — descending past a fork could surface a
    * bounded child of an unbounded join and mis-certify it. */
  private def linkedLogical(sp: SparkPlan): Option[LogicalPlan] =
    sp.logicalLink.orElse(
      if (sp.children.size == 1) linkedLogical(sp.children.head) else None)

  /** Every BNLJ in the plan has a build side provably bounded to
    * ≤ AttachBound rows; reports the offending bounds otherwise. */
  private def unboundedAttaches(plan: SparkPlan): Seq[String] =
    plan.collect { case b: BroadcastNestedLoopJoinExec =>
      val build = if (b.buildSide == BuildLeft) b.left else b.right
      val bound = linkedLogical(build).flatMap(_.maxRows)
      bound match {
        case Some(n) if n <= AttachBound => None
        case other => Some(s"BNLJ build side bound=$other")
      }
    }.flatten

  test("no query plans a CartesianProduct or SortAggregate; BNLJ only on scalar attaches") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("q_stream_")).flatMap {
      case (name, fn) =>
        try {
          val qe = fn(spark, sf0001).queryExecution
          val plan = qe.explainString(ExplainMode.fromString("formatted"))
          val bad = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "SortAggregate" -> plan.contains("SortAggregate")
          ).collect { case (op, true) => op } ++
            (if (plan.contains("BroadcastNestedLoopJoin"))
               unboundedAttaches(qe.sparkPlan)
             else Nil)
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
