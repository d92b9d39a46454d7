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

  test("temperature mixing: weights sum to ~1e6 and sqrt flattens the " +
       "distribution relative to proportional") {
    val out = ops.PipelineOps.queries("q_mix_temperature")(spark, sf0001)
      .select($"source".as[String], $"w_prop_micro".as[java.math.BigDecimal],
              $"w_temp_micro".as[java.math.BigDecimal]).collect()
    assert(out.nonEmpty)
    val prop = out.map(_._2.longValueExact)
    val temp = out.map(_._3.longValueExact)
    // floor-division truncation: each sum in (1e6 - nSources, 1e6]
    for (ws <- Seq(prop, temp)) {
      assert(ws.sum <= 1000000L && ws.sum > 1000000L - out.length,
        s"weight sum ${ws.sum} outside the truncation envelope")
    }
    // T=2 compresses: the largest source loses share, the smallest gains
    assert(temp.max <= prop.max, s"temp max ${temp.max} > prop ${prop.max}")
    assert(temp.min >= prop.min, s"temp min ${temp.min} < prop ${prop.min}")
  }
}
