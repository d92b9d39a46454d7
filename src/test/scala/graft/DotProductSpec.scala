package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot_product, l2_norm, sq_l2}

/** The native DotProduct expression must agree bitwise with the
  * HOF-composed equivalent (same element order, same double accumulation)
  * in both codegen and interpreted evaluation. */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def vec(n: Int) = Array.fill(n)(rnd.nextFloat() * 2 - 1)

  test("dot_product matches HOF aggregate bitwise on random float vectors") {
    val rows = (1 to 200).map(i => (i.toLong, vec(64), vec(64)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      dot_product($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b",
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    // sanity: nonzero values present
    assert(cmp.filter(abs($"fast") > 0).count() > 0)
  }

  test("sq_l2 matches HOF aggregate bitwise on random float vectors") {
    val rows = (1 to 200).map(i => (i.toLong, vec(64), vec(64)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      sq_l2($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    assert(cmp.filter($"fast" > 0).count() > 0)
  }

  test("sq_l2 survives interpreted (non-codegen) evaluation") {
    // NO_CODEGEN forces the interpreted projection (wholeStage=false
    // alone still codegens via GenerateUnsafeProjection's FALLBACK
    // mode), so nullSafeEval is actually exercised — see CmBucketsSpec.
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 6.0f))).toDF("a", "b")
      val got = df.select(sq_l2($"a", $"b")).as[Double].head()
      assert(got == 20.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("dot_product survives interpreted (non-codegen) evaluation") {
    // NO_CODEGEN forces the interpreted projection (wholeStage=false
    // alone still codegens via GenerateUnsafeProjection's FALLBACK
    // mode), so nullSafeEval is actually exercised — see CmBucketsSpec.
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      val got = df.select(dot_product($"a", $"b")).as[Double].head()
      assert(got == 11.0)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("dot_product is null-safe and length-tolerant") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f))),      // length mismatch
      (None, Some(Array(1.0f))),                          // null left
    ).toDF("a", "b")
    val got = df.select(dot_product($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(3.0), None))
  }

  test("l2_norm of unit axis vector is 1") {
    val df = Seq(Tuple1(Array(0.0f, 1.0f, 0.0f))).toDF("v")
    assert(df.select(l2_norm($"v")).as[Double].head() == 1.0)
  }
}
