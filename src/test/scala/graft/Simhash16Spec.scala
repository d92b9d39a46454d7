package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.simhash16

/** The native Simhash16 expression must agree bitwise with the HOF
  * spelling (the form the DuckDB oracle keeps) in both codegen and
  * interpreted evaluation. */
class Simhash16Spec extends SparkTestBase {
  import spark.implicits._

  private val hofForm =
    """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, j) ->
         acc + IF(aggregate(hs, CAST(0 AS BIGINT), (s2, h) ->
           s2 + ((shiftright(h, j) & CAST(1 AS BIGINT)) * 2 - 1)) > 0,
           shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"""

  test("simhash16 matches the HOF fold on random hash arrays") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { i =>
      (i.toLong, Array.fill(rnd.nextInt(50) + 1)(
        rnd.nextLong() & 0xffffffffL))
    }
    val df = rows.toDF("id", "hs")
    val cmp = df.select(simhash16($"hs").as("fast"), expr(hofForm).as("slow"))
    assert(cmp.filter($"fast" =!= $"slow").count() == 0)
    assert(cmp.filter($"fast" > 0).count() > 0)
  }

  test("simhash16 survives interpreted (non-codegen) evaluation") {
    // NO_CODEGEN forces the interpreted projection (wholeStage=false
    // alone still codegens via GenerateUnsafeProjection's FALLBACK
    // mode), so nullSafeEval is actually exercised — see CmBucketsSpec.
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      // two of three tokens have bit0 set → majority → bit0 in output;
      // bit1 set in only one → not in output
      val df = Seq(Tuple1(Array(1L, 1L, 2L))).toDF("hs")
      assert(df.select(simhash16($"hs")).as[Long].head() == 1L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("simhash16 edge cases: empty array, null array, exact tie") {
    val df = Seq(
      (1L, Some(Array.empty[Long])),
      (2L, None),
      (3L, Some(Array(1L, 0L))) // tie on bit0: 2*1 == 2 → not set
    ).toDF("id", "hs")
    val got = df.select($"id", simhash16($"hs").as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(0L), 2L -> None, 3L -> Some(0L)))
  }
}
