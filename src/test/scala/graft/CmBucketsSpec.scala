package graft

import org.apache.spark.sql.functions._

/** The native CmBuckets expression must agree with the HOF reference
  * spelling (graft.ops.cmBuckets over cmDigest — the arithmetic the
  * DuckDB oracle keeps) in both codegen and interpreted evaluation. */
class CmBucketsSpec extends SparkTestBase {
  import spark.implicits._
  import graft.ops.{cmBuckets, cmBucketsFast, cmDigest}

  test("cm_buckets matches the HOF digest-slice reference on longs") {
    val rnd = new scala.util.Random(59)
    val keys = (1 to 500).map(_ => rnd.nextLong() % 1000000L)
    val df = keys.toDF("k")
    val cmp = df.select(
      cmBucketsFast($"k").as("fast"),
      cmBuckets(cmDigest($"k")).as("slow"))
    assert(cmp.filter(expr("fast <> slow")).count() == 0)
    // all four rows populated, in range
    val flat = cmp.select(explode($"fast")).as[Long].collect()
    assert(flat.length == keys.size * 4)
    assert(flat.forall(b => b >= 0 && b < 256))
  }

  test("cm_buckets survives interpreted (non-codegen) evaluation") {
    // wholeStage=false alone is NOT enough: ProjectExec still compiles
    // expressions via GenerateUnsafeProjection (factoryMode FALLBACK
    // tries codegen first), so doGenCode would run and nullSafeEval
    // never would. NO_CODEGEN forces the interpreted projection — the
    // actual Janino-failure fallback path the test exists to cover.
    val prevW = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df = Seq(42L).toDF("k")
      val fast = df.select(cmBucketsFast($"k")).as[Seq[Long]].head()
      val slow = df.select(cmBuckets(cmDigest($"k"))).as[Seq[Long]].head()
      assert(fast == slow && fast.size == 4)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevW)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("cm_buckets null key: the DOCUMENTED divergence from the HOF form") {
    // Contract (CmBuckets scaladoc): the native expression is
    // null-strict (NULL key -> NULL array -> explode drops the row),
    // while the HOF spelling null-propagates PER ELEMENT
    // ([null, null, null, null] -> four (r, b=NULL) rows). The paths —
    // and the oracle — only agree on NON-NULL keys, which is why every
    // production call site keys on a non-null fixture column
    // (l_partkey, user_id). This test pins the divergence so it can
    // never be mistaken for agreement.
    val df = Seq(Some(7L), None).toDF("k")
    val native = df.select($"k", cmBucketsFast($"k").as("b")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.isNullAt(1)).toMap
    assert(native == Map(Some(7L) -> false, None -> true))
    val hof = df.filter($"k".isNull)
      .select(cmBuckets(cmDigest($"k")).as("b")).collect().head
    assert(!hof.isNullAt(0) &&
           hof.getSeq[Any](0) == Seq(null, null, null, null),
      "HOF form null-propagates per element — if this changed, " +
        "revisit the CmBuckets null contract")
  }
}
