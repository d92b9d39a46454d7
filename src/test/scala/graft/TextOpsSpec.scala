package graft

import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("fingerprint is order-sensitive (permuted docs differ)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fp = docs.withColumn("tok", split($"text", " "))
      .select($"doc_id",
        aggregate(
          transform(sequence(lit(1), size($"tok")),
            i => i.cast("long") *
                 (length(element_at($"tok", i)).cast("long") * 31 +
                  ascii(element_at($"tok", i)).cast("long"))),
          lit(0L), (acc, x) => acc + x).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) != fp(2L))
  }

  test("quality ratios are within [0, 1] on real docs") {
    val q = ops.TextOps.queries("q_text_quality")(spark, sf0001)
    val bad = q.filter($"stop_ratio" < 0 || $"stop_ratio" > 1 ||
                       $"ttr" <= 0 || $"ttr" > 1).count()
    assert(bad == 0)
  }

  test("langid confusion matrix counts sum to document count") {
    val total = ops.TextOps.queries("q_text_langid")(spark, sf0001)
      .agg(sum("n")).as[Long].head()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(total == docs)
  }
}
