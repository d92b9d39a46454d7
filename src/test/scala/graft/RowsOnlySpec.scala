package graft

import org.apache.spark.sql.functions._

/** The three rows-only queries have no DuckDB hash oracle by nature
  * (sketch / engine RNG / codec stub) — these laws are their substitute
  * contract, so "rows-only" never degrades to "unchecked". */
class RowsOnlySpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct is within 5% of the exact count per group") {
    val approx = ops.AggOps.queries("q_agg_approx_distinct")(spark, sf0001)
      .as[(String, Long)].collect().toMap
    val exact = ops.table(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx $a vs exact $n — beyond the 5% HLL envelope")
    }
  }

  test("seeded sample is reproducible and near the nominal rate") {
    val q = ops.ScanFilterOps.queries("q_sample_seeded")
    val a = q(spark, sf0001).collect().toSeq
    val b = q(spark, sf0001).collect().toSeq
    assert(a == b, "same seed + same input must give the same sample")
    val total = ops.table(spark, sf0001, "lineitem").count()
    val rate = a.size.toDouble / total
    assert(rate > 0.003 && rate < 0.03,
      s"sample rate $rate implausible for nominal 0.01")
  }

  test("mm_decode stub preserves the document population per language") {
    // The codec is a deterministic stand-in (no image libs in-sandbox),
    // but the Spark-side plumbing must be real: every language group of
    // documents appears, counts match the raw table, and the fake
    // features are within their documented domains.
    val out = ops.MultimodalOps.queries("q_mm_decode")(spark, sf0001)
      .select($"lang".as[String], $"n".as[Long], $"avg_luma".as[Double],
              $"max_w".as[Long], $"max_h".as[Long]).collect()
    val want = ops.table(spark, sf0001, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.map(_._1).toSet == want.keySet)
    out.foreach { case (lang, n, luma, w, h) =>
      assert(n == want(lang), s"$lang count $n != ${want(lang)}")
      assert(luma >= 0.0 && luma <= 255.0, s"luma $luma out of domain")
      assert(w > 0 && h > 0)
    }
  }
}
