package graft

import org.apache.spark.sql.functions._

/** Invariants of the event-analytics operators (funnel / retention /
  * streaks) that the hash oracle can't express directly. */
class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("funnel: converted never exceeds signups; rate in [0,1]") {
    val rows = run("q_funnel")
      .select($"n_signups".as[Long], $"n_converted".as[Long],
              $"conv_rate".as[Double]).collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, c, r) =>
      assert(c <= n && r >= 0.0 && r <= 1.0)
      assert(math.abs(r - c.toDouble / n) < 1e-6)
    }
  }

  test("retention: week 0 counts every cohort member exactly once") {
    val ret = run("q_retention").collect()
    // every user is active in their own first week, so the week_k=0 cell
    // of each cohort equals the cohort's size
    val firstWeek = ret.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val users = graft.ops.table(spark, sf0001, "events")
      .groupBy($"user_id")
      .agg(unix_micros(date_trunc("week", min($"ts"))).as("cw"))
      .groupBy($"cw").count().as[(Long, Long)].collect().toMap
    assert(firstWeek == users)
    // retention can only count users who exist in the cohort
    ret.groupBy(_.getLong(0)).foreach { case (cw, rows) =>
      rows.foreach(r => assert(r.getLong(2) <= users(cw)))
    }
  }

  test("streaks: islands are disjoint, consecutive, and cover active days") {
    val st = run("q_streaks")
      .select($"user_id".as[Long], $"streak_start".cast("string").as[String],
              $"streak_end".cast("string").as[String], $"n_days".as[Long])
      .collect()
    val activeDays = graft.ops.table(spark, sf0001, "events")
      .select($"user_id", $"ts".cast("date")).distinct().count()
    // island lengths sum to the number of distinct (user, day) pairs
    assert(st.map(_._4).sum == activeDays)
    st.foreach { case (_, s, e, n) =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(s), java.time.LocalDate.parse(e))
      assert(days == n - 1, s"island [$s,$e] must span exactly $n days")
    }
    // islands of the same user never touch (else they'd be one island)
    st.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          val gap = java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(e1), java.time.LocalDate.parse(s2))
          assert(gap >= 2, s"islands touching: end=$e1 next=$s2")
        case _ => ()
      }
    }
  }
}
