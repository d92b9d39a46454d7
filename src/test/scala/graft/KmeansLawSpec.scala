package graft.ops

/** Dual-path law for the size-gated driver-side Lloyd (round 22):
  * below spark.graft.kmeans.localMaxBytes the k-means shared build
  * collects the vectors and iterates on the driver; this spec pins the
  * local path to the distributed plan it replaces — cells (vec_id,
  * cid, dist) AND centroids (cid, c) must be BIT-identical (double ==,
  * not approx), on real fixtures, because every decimal mean and every
  * in-order distance fold feeds oracle-hashed consumers
  * (q_cluster_kmeans's inertia, q_dedup_semantic's pair distances, the
  * IVF probe ranking). Same pattern as the union-find law test
  * (DedupSimSpec). */
class KmeansLawSpec extends graft.SparkTestBase {

  private def cellsAndCents(d: String, forceDistributed: Boolean)
      : (Seq[(Long, Long, Double)], Seq[(Long, Seq[Double])]) = {
    SimOps.clearSimCaches()
    if (forceDistributed)
      spark.conf.set("spark.graft.kmeans.localMaxBytes", "0")
    try {
      val cells = SimOps.kmeansCells(spark, d)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val cents = SimOps.kmeansCents(spark, d)
        .orderBy("cid").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
      (cells, cents)
    } finally {
      if (forceDistributed)
        spark.conf.unset("spark.graft.kmeans.localMaxBytes")
      SimOps.clearSimCaches()
    }
  }

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"driver Lloyd == distributed Lloyd on $d") {
      val (lCells, lCents) = cellsAndCents(d, forceDistributed = false)
      val (dCells, dCents) = cellsAndCents(d, forceDistributed = true)
      assert(lCells.nonEmpty)
      assert(lCells.size == dCells.size,
        s"cell count ${lCells.size} != ${dCells.size}")
      lCells.zip(dCells).foreach { case (a, b) =>
        assert(a == b, s"cell mismatch: local $a != distributed $b")
      }
      assert(lCents == dCents,
        s"centroid mismatch: local $lCents != distributed $dCents")
    }
  }
}
