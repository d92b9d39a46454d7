package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{Sessionize, StreamOps}

/** The arbitrary per-key stateful automaton (q_stream_funnel_state):
  * the 4-state session-funnel transitions, both emission paths
  * (in-function gap close and event-time timeout), and the batch replay
  * identity against the greedy chained-min spelling the DuckDB oracle
  * keeps. */
class FunnelStateSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 60L * 1000 * 1000 // one minute in µs
  private def ev(u: Long, id: Long, t: String, tsUs: Long) =
    Sessionize.FunnelEvent(u, id, t, tsUs,
      new java.sql.Timestamp(tsUs / 1000))

  test("funnel automaton: ordered stages, gap close, timeout close") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.FunnelEvent]
    val out = Sessionize.funnel(mem.toDS(), "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_state_test").start()
    try {
      val base = 1000000L * m // off epoch 0 (ts=0 == initial watermark)
      // Session 1 (user 1): click BEFORE any view must not advance;
      // then view → click → purchase completes the funnel (stage 3).
      // The user-1 event 60 min later exceeds the 30-min gap → session 1
      // closes IN-FUNCTION; the new session starts on a 'purchase',
      // which advances nothing (stage 0).
      mem.addData(
        ev(1, 1, "click", base),
        ev(1, 2, "view", base + 1 * m),
        ev(1, 3, "click", base + 2 * m),
        ev(1, 4, "purchase", base + 3 * m),
        ev(1, 5, "purchase", base + 63 * m))
      q.processAllAvailable()
      // user 1 idle; user-2 traffic advances the watermark past
      // session-2 end + gap. Batch N computes the watermark that gates
      // batch N+1, so two more arrivals drive the timeout flush.
      mem.addData(ev(2, 6, "view", base + 300 * m))
      q.processAllAvailable()
      mem.addData(ev(2, 7, "view", base + 301 * m))
      q.processAllAvailable()
      val got = spark.table("funnel_state_test")
        .as[Sessionize.FunnelSession].collect().toSet
      assert(got == Set(
        Sessionize.FunnelSession(1, base, base + 3 * m, 4, 3),
        Sessionize.FunnelSession(1, base + 63 * m, base + 63 * m, 1, 0)),
        s"expected one gap-closed and one TIMEOUT-closed session, got $got")
    } finally q.stop()
  }

  test("stage semantics: out-of-order steps never skip ahead") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Sessionize.FunnelEvent]
    val out = Sessionize.funnel(mem.toDS(), "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_order_test").start()
    try {
      val base = 2000000L * m
      // user 3: purchase, click, view (reverse order) → only the view
      // counts (stage 1). user 4: view, purchase (no click) → stage 1:
      // purchase cannot fire from stage 1. Both closed by gap.
      mem.addData(
        ev(3, 1, "purchase", base),
        ev(3, 2, "click", base + 1 * m),
        ev(3, 3, "view", base + 2 * m),
        ev(3, 4, "error", base + 60 * m),
        ev(4, 5, "view", base),
        ev(4, 6, "purchase", base + 1 * m),
        ev(4, 7, "error", base + 60 * m))
      q.processAllAvailable()
      val got = spark.table("funnel_order_test")
        .as[Sessionize.FunnelSession].collect().toSet
      assert(got == Set(
        Sessionize.FunnelSession(3, base, base + 2 * m, 3, 1),
        Sessionize.FunnelSession(4, base, base + 1 * m, 2, 1)), got)
    } finally q.stop()
  }

  test("q_stream_funnel_state equals the batch greedy chained-min form") {
    val got = StreamOps.queries("q_stream_funnel_state")(spark, sf0001)
      .collect().toSeq
    // Batch replica of the oracle: q_sessionize's session assignment,
    // then the greedy funnel as three chained mins over the per-session
    // row_number (the same (tsu, event_id) total order the automaton
    // sorts by).
    val w = Window.partitionBy($"user_id").orderBy($"tsu", $"event_id")
    val o = ops.table(spark, sf0001, "events")
      .select($"user_id", $"event_id", $"event_type",
              unix_micros($"ts").as("tsu"))
      .withColumn("prev", lag($"tsu", 1).over(w))
      .withColumn("is_new",
        when($"prev".isNull || $"tsu" - $"prev" > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id", $"session_id")
          .orderBy($"tsu", $"event_id")))
    val s1 = o.groupBy("user_id", "session_id")
      .agg(min($"tsu").as("session_start"), max($"tsu").as("session_end"),
           count(lit(1)).as("n_events"),
           min(when($"event_type" === "view", $"rn")).as("vk"))
    val s2 = o.join(s1.select($"user_id", $"session_id", $"vk"),
                    Seq("user_id", "session_id"))
      .groupBy("user_id", "session_id")
      .agg(min(when($"event_type" === "click" && $"rn" > $"vk", $"rn"))
        .as("ck"))
    val s3 = o.join(s2, Seq("user_id", "session_id"))
      .groupBy("user_id", "session_id")
      .agg(min(when($"event_type" === "purchase" && $"rn" > $"ck", $"rn"))
        .as("pk"))
    val want = s1.join(s2, Seq("user_id", "session_id"))
      .join(s3, Seq("user_id", "session_id"))
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        ($"vk".isNotNull.cast("int") + $"ck".isNotNull.cast("int") +
         $"pk".isNotNull.cast("int")).as("stage"))
      .orderBy("user_id", "session_start")
      .collect().toSeq
    assert(got == want,
      s"stream (${got.size} rows) != batch (${want.size} rows)")
    assert(got.nonEmpty)
  }

  test("transformWithState twin is row-identical to flatMapGroupsWithState") {
    // Same automaton, two arbitrary-state APIs (GroupState + timeout vs
    // typed ValueState + explicit event-time timers on RocksDB): the API
    // is an execution detail, so the outputs must be bit-identical.
    val fmg = StreamOps.queries("q_stream_funnel_state")(spark, sf0001)
      .collect().toSeq
    val tws = StreamOps.queries("q_stream_funnel_tws")(spark, sf0001)
      .collect().toSeq
    assert(tws == fmg, s"tws ${tws.size} rows vs fmg ${fmg.size} rows")
    assert(tws.nonEmpty)
  }
}
