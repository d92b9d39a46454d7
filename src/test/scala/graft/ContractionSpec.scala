package graft

import org.apache.spark.sql.functions._

/** Locks the round-13 content-contraction equivalence on a COPY-DENSE
  * corpus — the case the oracle gates barely exercise (sf0.001/sf0.01
  * documents are ~all-distinct, so the contraction is a near-no-op
  * there; the 10×/100× stress fixtures where it matters run outside
  * sbt). Builds a 3-copy key-shifted corpus (every content a 3-clique,
  * the miniature of the ScaleStress shape) and checks each contracted
  * clustering query against a driver-side union-find over the
  * UNCONTRACTED pair listings, which are themselves public query
  * answers (q_dedup_minhash / q_dedup_embed) — so the referee shares no
  * code with the contraction under test.
  */
class ContractionSpec extends SparkTestBase {
  import spark.implicits._

  private val stride = 10000000L

  lazy val dir: String = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_copydense_").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    (0 until 3).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * stride)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    (0 until 3).map(i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * stride)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  /** Union-find; final root of each component is its min member id
    * (each union parents the larger root under the smaller). */
  private def minLabels(nodes: Seq[Long],
                        edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long](
      nodes.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(x => x -> find(x)).toMap
  }

  private lazy val docIds: Seq[Long] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").as[Long].collect().toSeq

  private lazy val minhashEdges: Seq[(Long, Long)] =
    SparkEntry.queries("q_dedup_minhash")(spark, dir)
      .filter(col("n_bands") >= 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSeq

  test("contracted minhash clusters equal union-find over the " +
       "uncontracted pair listing on a copy-dense corpus") {
    val lab = minLabels(docIds, minhashEdges)
    val want = lab.values.groupBy(identity)
      .map { case (c, xs) => (c, xs.size.toLong) }.toSeq.sorted
    val got = SparkEntry.queries("q_dedup_minhash_clusters")(spark, dir)
      .select($"cluster", $"csize").as[(Long, Long)].collect().toSeq
    assert(got == want)
    // the corpus actually is copy-dense: every content is a 3-clique,
    // so no cluster may be smaller than 3
    assert(want.forall(_._2 >= 3), "staging lost the copy cliques")
  }

  test("contracted multi-signal clusters equal union-find over " +
       "exact ∪ minhash ∪ embedding edges on a copy-dense corpus") {
    val exactEdges = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        md5(trim(lower($"text")).cast("binary")).as("k"))
      .as[(Long, String)].collect().toSeq
      .groupBy(_._2).values.flatMap { g =>
        val ids = g.map(_._1).sorted
        ids.tail.map(x => (ids.head, x))
      }.toSeq
    val embedEdges = SparkEntry.queries("q_dedup_embed")(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
    val lab = minLabels(docIds, exactEdges ++ minhashEdges ++ embedEdges)
    val want = docIds.sorted.map(id =>
      (id, lab(id), if (lab(id) == id) 1L else 0L))
    val got = SparkEntry.queries("q_dedup_multi_signal")(spark, dir)
      .select($"doc_id", $"cluster", $"keep")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    graft.ops.DedupOps.clearPairsCache()
  }
}
