package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Laws for the round-19 additions: the epochs-per-source upsampler
  * (q_mix_epochs) is re-derived by an in-memory brute force on sf0.001
  * — independent of both the Spark plan and the DuckDB oracle spelling
  * — and its plan must contain NO shuffle before the final output sort
  * (the op's 100-TB contract: one map-side projection + a bounded
  * in-row explode). */
class R19OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("mix_epochs matches a brute-force fractional-epoch replay plan") {
    val docs = ops.table(spark, sf0001, "documents")
      .select($"doc_id".as[Long], $"source".as[String]).collect().toSeq
    val expect = docs.flatMap { case (id, src) =>
      val em = ("[0-9]+".r.findFirstIn(src).get.toLong % 4 + 1) * 750000L
      val u = java.lang.Long.parseLong(
        md5hex(s"ep:$src:$id").take(8), 16) % 1000000L
      val n = em / 1000000L + (if (u < em % 1000000L) 1L else 0L)
      (0L until n).map(c => (id, src, c))
    }.sortBy(t => (t._1, t._3))
    val got = ops.PipelineOps.queries("q_mix_epochs")(spark, sf0001)
      .select($"doc_id".as[Long], $"source".as[String],
              $"copy_id".as[Long]).collect().toSeq
    assert(got == expect)
    // the mix is live in BOTH directions: some docs dropped (<1 epoch
    // sources), some replayed (>1 epoch sources)
    val perDoc = got.groupBy(_._1).view.mapValues(_.size)
    assert(perDoc.values.exists(_ >= 3) &&
           got.map(_._1).toSet.size < docs.size,
      "degenerate mix: expected both upsampled and dropped docs")
    // integer-epoch sources are exact: srcnum % 4 == 3 -> em =
    // (3+1)·0.75 = 3.0 -> every doc emits exactly 3 copies, never a
    // Bernoulli extra
    val threeEpoch = docs.filter { case (_, s) =>
      "[0-9]+".r.findFirstIn(s).get.toLong % 4 == 3 }.map(_._1).toSet
    assert(threeEpoch.nonEmpty &&
           threeEpoch.forall(id => perDoc.getOrElse(id, 0) == 3),
      "em = 3.0 sources must replay exactly 3x")
  }

  test("mix_epochs plan has no shuffle before the output sort") {
    // sparkPlan, not executedPlan: the AQE wrapper hides its inner tree
    // from collect() until execution (PlanShapeSpec's idiom)
    val plan = ops.PipelineOps.queries("q_mix_epochs")(spark, sf0001)
      .queryExecution.sparkPlan
    // walk below the top-level sort: the only exchange allowed is the
    // sort's own range partitioning; the generate/filter/project chain
    // under it must be shuffle-free (map-side at any scale)
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.nonEmpty, s"expected an output sort:\n$plan")
    val belowSort = sorts.head.child.collect {
      case e: ShuffleExchangeExec => e }
    val nonRange = belowSort.filterNot(
      _.outputPartitioning.toString.contains("range"))
    assert(nonRange.isEmpty,
      s"upsampler must be map-side; found shuffles:\n$nonRange")
  }
}
