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
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val df = Seq(42L).toDF("k")
      val fast = df.select(cmBucketsFast($"k")).as[Seq[Long]].head()
      val slow = df.select(cmBuckets(cmDigest($"k"))).as[Seq[Long]].head()
      assert(fast == slow && fast.size == 4)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("cm_buckets null key yields null, matching the HOF form") {
    val df = Seq(Some(7L), None).toDF("k")
    val got = df.select($"k", cmBucketsFast($"k").as("b")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        r.isNullAt(1)).toMap
    assert(got == Map(Some(7L) -> false, None -> true))
  }
}
