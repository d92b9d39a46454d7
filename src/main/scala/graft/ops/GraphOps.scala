package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics beyond the similarity graph (which lives
  * with its dedup producers in [[DedupOps]]): iterative PageRank over a
  * graph derived from the warehouse tables.
  *
  * Determinism: PageRank is usually float — cross-engine float iteration
  * compounds ulp drift, so this one is INTEGER PageRank in micro-units:
  * pr₀ = 1 000 000; each round pr' = 150 000 + (85 · Σ_in (pr DIV
  * outdeg)) DIV 100. Every operation is int64 arithmetic both engines
  * execute bit-identically, so a fixed iteration count hash-matches an
  * unrolled-CTE DuckDB oracle exactly — the same trick as the
  * milli-unit surprisal score.
  *
  * Scale posture: one shuffle join (contributions keyed by dst) plus one
  * grouped sum per iteration — the standard message-passing round, AQE
  * skew-handled; the edge list and degree table are computed once and
  * reused. Teleport handling: the derived bipartite graph is
  * symmetrized, so every node has in- and out-degree ≥ 1 and no
  * dangling-mass redistribution is needed.
  */
object GraphOps {

  /** Fixed-iteration integer PageRank over a symmetric edge list
    * (`src`, `dst` long columns). Returns (node, pr) in micro-units.
    *
    * The final frame is ONE plan containing every round as a subtree —
    * without caching, the (edges ⋈ outdeg) message base would be
    * recomputed per round (scan + distinct + agg × iters), so the caller
    * passes an already-persisted base via [[messageBase]]. */
  private[graft] def pagerank(withDeg: DataFrame, iters: Int): DataFrame = {
    var pr = withDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L))
    for (_ <- 1 to iters) {
      pr = withDeg.join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy(col("dst"))
        .agg(expr("150000 + (85 * sum(c)) DIV 100").as("pr"))
        .select(col("dst").as("node"), col("pr"))
    }
    pr
  }

  /** The persisted (edges ⋈ outdeg) message base, memoized per
    * (session, dir) — the [[DedupOps.clearPairsCache]] pattern: repeat
    * q_graph_pagerank invocations in a long-lived session (Verify, an
    * interactive Graft session) reuse ONE persisted frame instead of
    * stacking a new persist per call. Release via [[clearMessageCache]]
    * (Bench's between-pass hook calls it alongside the dedup caches). */
  private val baseCache =
    new scala.collection.concurrent.TrieMap[(org.apache.spark.sql
      .SparkSession, String), DataFrame]

  /** Attach each edge's source out-degree — the message base shape
    * [[pagerank]] consumes. */
  private[graft] def withDegree(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    edges.join(deg, "src")
  }

  private def messageBase(s: org.apache.spark.sql.SparkSession,
                          d: String): DataFrame =
    baseCache.getOrElseUpdate((s, d), {
      // The distinct edge set feeds BOTH branches of the symmetrizing
      // union, and Catalyst has no cross-branch subtree reuse — without
      // the persist the full-corpus scan+distinct runs twice (measured
      // ~1 s of the query's 4.4 s at sf0.1). The small distinct frame is
      // persisted only while the base materializes, then released: the
      // memoized entry is the joined base, not the raw edges.
      val e0 = table(s, d, "lineitem")
        .select(col("l_partkey").as("src"),
                (col("l_suppkey") + Off).as("dst"))
        .distinct()
        .persist()
      val base = withDegree(e0.unionAll(e0.select(col("dst").as("src"),
                                                  col("src").as("dst"))))
        .persist()
      base.count() // materialize before dropping the edge frame
      e0.unpersist()
      base
    })

  /** Drop the memoized message bases and release their storage. */
  def clearMessageCache(): Unit = {
    baseCache.values.foreach(df =>
      try df.unpersist() catch { case _: Exception => () })
    baseCache.clear()
  }

  /** Supplier id offset making part and supplier node ids disjoint (far
    * above any key the 10×/100× shifted fixtures produce). */
  private val Off = 1000000000000L

  val queries: Map[String, QB] = Map(
    // PageRank over the part–supplier fulfillment graph: which parts and
    // suppliers sit most centrally in the supply network. Nodes = parts ∪
    // (suppliers + Off); one symmetric edge per distinct (part, supplier)
    // lineitem pairing; 3 rounds. Output is every node's micro-unit rank.
    "q_graph_pagerank" -> ((s, d) =>
      pagerank(messageBase(s, d), 3)
        .select(col("node").as("node_id"), col("pr").as("pr_micro"))
        .orderBy("node_id")),
  )

  val oracles: Map[String, String] = Map(
    "q_graph_pagerank" -> """
      WITH e0 AS (SELECT DISTINCT l_partkey AS src,
                         l_suppkey + 1000000000000 AS dst FROM lineitem),
      e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      p0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr
             FROM e GROUP BY src),
      i1 AS (SELECT e.dst AS node,
                    150000 + (85 * sum(p0.pr // deg.outdeg)) // 100 AS pr
             FROM e JOIN p0 ON e.src = p0.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      i2 AS (SELECT e.dst AS node,
                    150000 + (85 * sum(i1.pr // deg.outdeg)) // 100 AS pr
             FROM e JOIN i1 ON e.src = i1.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      i3 AS (SELECT e.dst AS node,
                    150000 + (85 * sum(i2.pr // deg.outdeg)) // 100 AS pr
             FROM e JOIN i2 ON e.src = i2.node JOIN deg ON e.src = deg.src
             GROUP BY e.dst)
      SELECT node AS node_id, CAST(pr AS BIGINT) AS pr_micro
      FROM i3
      ORDER BY node_id""",
  )
}
