package graft

import org.apache.spark.sql.functions._

import graft.functions.KMinAgg

/** The bounded KMV buffer must agree exactly with the brute-force
  * "sort-distinct, take k" definition — including duplicate absorption,
  * saturation, and merge across arbitrary partitionings. */
class KMinAggSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce matches brute force under duplicates and saturation") {
    val agg = new KMinAgg(8)
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(500)(rnd.nextInt(40).toLong) // heavy duplication
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == brute(xs, 8))
  }

  test("merge is order- and partitioning-independent") {
    val agg = new KMinAgg(8)
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(300)(rnd.nextInt(60).toLong)
    val expected = brute(xs, 8)
    for (splits <- Seq(2, 3, 7)) {
      val bufs = xs.grouped(math.max(1, xs.size / splits))
        .map(chunk => chunk.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == expected, s"splits=$splits")
    }
  }

  test("distributed agg equals a window-sorted distinct top-k") {
    val k = 5
    val kmin = udaf(new KMinAgg(k), org.apache.spark.sql.Encoders.scalaLong)
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(2000)((rnd.nextInt(3).toString, rnd.nextInt(200).toLong))
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy($"g").agg(kmin($"v").as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> brute(vs.map(_._2), k)
    }
    assert(got == want)
  }
}
