package graft

/** Brute-force laws for the round-15 warehouse additions: the SCD2
  * dimension-history build and the file-compaction planner. Both are
  * recomputed with plain Scala collections over the sf0.001 fixture and
  * compared exactly. */
class Scd2CompactionSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("scd2 = per-user run-collapse with contiguous validity windows") {
    val events = ops.table(spark, sf0001, "events")
      .select($"user_id".as[Long], $"event_type".as[String],
        unix_micros($"ts").as[Long], $"event_id".as[Long]).collect()
    val want = events.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      // collapse runs of equal consecutive statuses
      val runs = scala.collection.mutable.ArrayBuffer[
        (String, Long, Long)]() // status, valid_from, n_events
      ordered.foreach { case (_, st, ts, _) =>
        if (runs.nonEmpty && runs.last._1 == st) {
          val l = runs.last; runs(runs.size - 1) = (l._1, l._2, l._3 + 1)
        } else runs += ((st, ts, 1L))
      }
      runs.zipWithIndex.map { case ((st, vf, n), i) =>
        val vt = if (i + 1 < runs.size) Some(runs(i + 1)._2) else None
        (uid, (i + 1).toLong, st, vf, vt, vt.isEmpty, n)
      }
    }.sortBy(r => (r._1, r._2))
    val got = ops.WarehouseOps.queries("q_scd2")(spark, sf0001)
      .select("user_id", "version", "status", "valid_from", "valid_to",
        "is_current", "n_events")
      .as[(Long, Long, String, Long, Option[Long], Boolean, Long)]
      .collect()
    assert(got.length == want.length, "version count")
    assert(got.toSeq == want.toSeq)
    // structural invariants: windows chain per user, exactly one open
    got.groupBy(_._1).foreach { case (uid, vs) =>
      assert(vs.count(_._6) == 1, s"user $uid must have ONE current row")
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid windows must chain")
          assert(a._3 != b._3, s"user $uid adjacent versions must differ")
        case _ => ()
      }
    }
  }

  test("compaction bins partition every file at the 4096 target") {
    val docs = ops.table(spark, sf0001, "documents")
      .select($"source".as[String], $"doc_id".as[Long],
        $"n_chars".as[Long]).collect()
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, id, n) =>
        val bin = cum / 4096; cum += n; (src, bin, id, n)
      }
    }.groupBy(r => (r._1, r._2)).toSeq.map { case ((src, bin), fs) =>
      (src, bin, fs.size.toLong, fs.map(_._4).sum,
       fs.map(_._3).min, fs.map(_._3).max)
    }.sortBy(r => (r._1, r._2))
    val got = ops.WarehouseOps.queries("q_compaction")(spark, sf0001)
      .select("source", "bin", "n_files", "bytes", "first_doc",
        "last_doc")
      .as[(String, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.toSeq == want.toSeq)
    // the plan must cover every file exactly once and respect the
    // target: every bin except possibly a partition's last holds less
    // than target + its own last file's bytes (first-fit property)
    assert(got.map(_._3).sum == docs.length, "bins must partition files")
    assert(got.map(_._4).sum == docs.map(_._3).sum, "bytes must total")
    val maxFile = docs.map(_._3).max
    got.groupBy(_._1).foreach { case (src, bins) =>
      bins.sortBy(_._2).dropRight(1).foreach { b =>
        assert(b._4 >= 4096 - maxFile,
          s"$src bin ${b._2} closed too early: ${b._4} bytes")
      }
    }
  }

  test("mix_softdedup weights every copy at exactly 1e6 DIV copies") {
    val docs = ops.table(spark, sf0001, "documents")
      .select($"source".as[String],
        md5(trim(lower($"text")).cast("binary")).as[String]).collect()
    val copies = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val want = docs.groupBy(_._1).toSeq.map { case (src, ds) =>
      val eff = ds.map(d => 1000000L / copies(d._2)).sum
      (src, ds.length.toLong, ds.map(_._2).distinct.length.toLong, eff,
       r6(eff.toDouble / (ds.length.toLong * 1000000L)))
    }.sortBy(_._1)
    val got = ops.PipelineOps.queries("q_mix_softdedup")(spark, sf0001)
      .select("source", "n_docs", "n_contents", "eff_docs_micro",
        "softdedup_ratio")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.toSeq == want.toSeq)
    // a corpus with no duplicate contents must weight every doc fully
    got.foreach { case (src, n, nc, eff, _) =>
      if (n == nc) assert(eff == n * 1000000L, s"$src all-distinct weight")
      else assert(eff < n * 1000000L, s"$src must down-weight copies")
    }
  }
}
