package graft

/** Laws for the corpus-assembly operators (PipelineOps). */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("weighted mixing: kept counts bounded, rates from the fixed menu") {
    val out = ops.PipelineOps.queries("q_mix_weighted")(spark, sf0001)
      .select($"source".as[String], $"n_total".as[Long], $"n_kept".as[Long],
              $"target_rate".as[Double]).collect()
    assert(out.nonEmpty)
    val menu = Set(0.2, 0.4, 0.6, 0.8)
    out.foreach { case (src, total, kept, rate) =>
      assert(kept >= 0 && kept <= total, s"$src kept $kept of $total")
      assert(menu.contains(rate), s"$src target_rate $rate not in $menu")
    }
  }

  test("weighted mixing is deterministic (hash-bucket, no RNG state)") {
    val a = ops.PipelineOps.queries("q_mix_weighted")(spark, sf0001)
      .collect().toSeq
    val b = ops.PipelineOps.queries("q_mix_weighted")(spark, sf0001)
      .collect().toSeq
    assert(a == b)
  }
}
