package graft

import org.apache.spark.sql.functions._

/** Runner-harness semantics without spawning the CLI: seeded shuffle
  * determinism (SURVEY.md §2.1 A17) and the Laghos-schema flagship shape. */
class RunnerSpec extends SparkTestBase {
  import spark.implicits._

  /** Spawn the runner CLI as a child JVM with the given flags + stdin,
    * returning (exitCode, stdout, stderr). One shared recipe for every
    * end-to-end test (the spawn details — add-opens forwarding, memory,
    * master — must not drift between them). */
  private def spawnRunner(flags: Seq[String], stdinText: String,
                          jvmProps: Seq[String] = Nil)
      : (Int, String, String) = {
    import scala.sys.process._
    // Forward this JVM's --add-opens set (sbt injects the JDK-17 module
    // options Spark needs). RuntimeMXBean reports the two-token spelling
    // ("--add-opens", "mod=ALL-UNNAMED") as separate entries — keep the
    // value token too, or the child dies with "--add-opens requires
    // modules".
    val raw = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.toArray.map(_.toString).toSeq
    val jvmArgs = raw.zipWithIndex.flatMap { case (a, i) =>
      if (a.startsWith("--add-opens=")) Seq(a)
      else if (a == "--add-opens")
        Seq(a) ++ raw.lift(i + 1).toSeq
      else if (i > 0 && raw(i - 1) == "--add-opens") Nil // consumed above
      else Nil
    }
    val cmd = Seq("java") ++ jvmArgs ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false") ++ jvmProps ++ Seq(
      "-cp", sys.props("java.class.path"),
      "graft.runner.Main") ++ flags
    val stdin = new java.io.ByteArrayInputStream(stdinText.getBytes)
    val out = new StringBuilder
    val err = new StringBuilder
    // Main reads the master from SPARK_MASTER (a -D flag would be dead:
    // the builder sets .master explicitly)
    val code = (Process(cmd, None, "SPARK_MASTER" -> "local[2]") #< stdin)
      .!(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') },
        l => err.synchronized { err.append(l).append('\n') }))
    (code, out.toString, err.toString)
  }

  test("seed-1 shuffle is deterministic across runs") {
    val xs = (1 to 100).map(i => s"file_$i.parquet")
    val a = new scala.util.Random(1).shuffle(xs)
    val b = new scala.util.Random(1).shuffle(xs)
    assert(a == b && a != xs)
  }

  test("flag parsing covers the reference CLI surface") {
    import graft.runner.Main
    val o = Main.parse(
      List("-i", "AK", "-k", "SK", "-a", "10.0.0.5", "-p", "9009", "-j", "7"),
      Main.Opts())
    assert(o == Main.Opts(Some("AK"), Some("SK"), "10.0.0.5", 9009, 7))
    assert(Main.parse(Nil, Main.Opts()) ==
      Main.Opts(None, None, "127.0.0.1", 9000, 4))
  }

  test("opts map to the s3a session config block") {
    import graft.runner.Main
    val conf = Main.s3aConfigs(
      Main.Opts(Some("AK"), Some("SK"), "minio.local", 9000, 4)).toMap
    assert(conf("spark.hadoop.fs.s3a.endpoint") == "http://minio.local:9000")
    assert(conf("spark.hadoop.fs.s3a.path.style.access") == "true")
    assert(conf("spark.hadoop.fs.s3a.connection.ssl.enabled") == "false")
    assert(conf("spark.hadoop.fs.s3a.access.key") == "AK")
    assert(conf("spark.hadoop.fs.s3a.secret.key") == "SK")
    // no credential keys leak into the config when flags are absent
    val anon = Main.s3aConfigs(Main.Opts()).toMap
    assert(!anon.contains("spark.hadoop.fs.s3a.access.key"))
    assert(!anon.contains("spark.hadoop.fs.s3a.secret.key"))
  }

  test("full CLI end-to-end over local files: chunks, stats, isolation") {
    val good = s"$sf0001/lineitem.parquet"
    val (code, outS, e) = spawnRunner(
      Seq("-i", "TESTKEY", "-k", "TESTSECRET", "-a", "127.0.0.1",
          "-p", "9000", "-j", "2"),
      s"$good /nonexistent/missing.parquet\n'$good'\n")
    val out = new StringBuilder(outS)
    assert(code == 0, s"exit=$code stderr:\n${e.takeRight(2000)}")
    assert(e.contains("Number data sources (parquet files): 3"))
    assert(e.contains("Threads: 2"))
    assert(e.contains("error processing /nonexistent/missing.parquet"))
    assert(e.contains("Total hits: "))
    assert(e.contains("Total read bytes: "))
    assert(e.contains("Done"))
    // both good files produced chunked rows despite the bad sibling,
    // in the reference's columnar DataChunk format
    assert(out.toString.linesIterator.count(_.startsWith("Chunk - [5 Columns]")) >= 2)
    assert(out.toString.linesIterator.exists(_.startsWith("- FLAT BIGINT: ")))
    assert(out.toString.linesIterator.exists(_.startsWith("- FLAT DOUBLE: ")))
  }

  test("full CLI end-to-end over the HTTP object profile: remote reads, GET-level op stats") {
    val server = TestHttpObjectServer.serve(sf0001)
    try {
      val port = server.getAddress.getPort
      val (code, outS, e) = spawnRunner(Seq("-j", "2"),
        s"ghttp://127.0.0.1:$port/lineitem.parquet\n")
      val out = new StringBuilder(outS)
      assert(code == 0, s"exit=$code stderr:\n${e.takeRight(2000)}")
      assert(e.contains("Number data sources (parquet files): 1"))
      assert(e.contains("Total hits: "))
      // GET-level accounting (not the scan-task fallback): the monitored
      // filesystem counted actual ranged requests
      val opsLine = e.linesIterator.find(_.startsWith("Total read ops: "))
      assert(opsLine.isDefined, s"no GET-level op line in:\n$e")
      assert(opsLine.get.stripPrefix("Total read ops: ").trim.toLong > 0)
      assert(e.contains("Done"))
      assert(out.toString.linesIterator.exists(_.startsWith("Chunk - [5 Columns]")))
    } finally server.stop(0)
  }

  test("CLI -i/-k drive real request auth on the HTTP object profile") {
    val creds = ("TESTKEY", "TESTSECRET")
    val server = TestHttpObjectServer.serve(sf0001, auth = Some(creds))
    try {
      val src = s"ghttp://127.0.0.1:${server.getAddress.getPort}/lineitem.parquet\n"
      // without credentials: the server's 401 surfaces as a per-file error
      // (isolation keeps exit 0), zero hits, no chunk output
      val (code0, out0, err0) = spawnRunner(Seq("-j", "1"), src)
      assert(code0 == 0, s"exit=$code0")
      assert(err0.contains("error processing"), s"expected a 401-driven error:\n$err0")
      assert(err0.contains("Total hits: 0"))
      assert(!out0.contains("Chunk - ["))
      // with -i/-k: every HEAD/GET is HMAC-signed, query green, GET-level
      // op accounting intact
      val (code1, out1, err1) = spawnRunner(
        Seq("-i", creds._1, "-k", creds._2, "-j", "1"), src)
      assert(code1 == 0, s"exit=$code1 stderr:\n${err1.takeRight(2000)}")
      assert(!err1.contains("error processing"), s"unexpected error:\n$err1")
      val opsLine = err1.linesIterator.find(_.startsWith("Total read ops: "))
      assert(opsLine.isDefined, s"no GET-level op line in:\n$err1")
      assert(opsLine.get.stripPrefix("Total read ops: ").trim.toLong > 0)
      assert(out1.linesIterator.exists(_.startsWith("Chunk - [5 Columns]")))
    } finally server.stop(0)
  }

  test("credentialed fan-out (j>1): stat-block bytes reconcile with wire truth") {
    // The last untested corner of the A2 credential surface: -i/-k under
    // PARALLEL per-file fan-out, with the stat block's byte count checked
    // against what the server actually wrote to the wire. Wire truth has
    // a documented slack: every sequential GET is bounded by the
    // readahead window (fs.ghttp.readahead.bytes — pinned small here),
    // so the server may push at most one window per counted op beyond
    // what the client consumed; positioned reads are exact. The stat
    // must sit inside [wire − ops·window, wire], and the triple run must
    // count exactly 3× the single run — no lost updates or resets when
    // three signed scans interleave on the fixed pool.
    val creds = ("TESTKEY", "TESTSECRET")
    val window = 4096L
    val props = Seq(s"-Dspark.hadoop.fs.ghttp.readahead.bytes=$window")
    def run(n: Int): (Long, Long, Long) = {
      val wire = new java.util.concurrent.atomic.AtomicLong(0L)
      val server = TestHttpObjectServer.serve(sf0001, auth = Some(creds),
        bytesServed = Some(wire))
      try {
        val base = s"ghttp://127.0.0.1:${server.getAddress.getPort}"
        val src = (s"$base/lineitem.parquet\n") * n
        val (code, out, err) = spawnRunner(
          Seq("-i", creds._1, "-k", creds._2, "-j", n.toString), src, props)
        assert(code == 0, s"exit=$code stderr:\n${err.takeRight(2000)}")
        assert(err.contains(s"Number data sources (parquet files): $n"))
        assert(!err.contains("error processing"), s"unexpected error:\n$err")
        assert(out.linesIterator
          .count(_.startsWith("Chunk - [5 Columns]")) >= n)
        def stat(prefix: String): Long = err.linesIterator
          .find(_.startsWith(prefix)) match {
            case Some(l) => l.stripPrefix(prefix).trim.toLong
            case None => fail(s"no '$prefix' line in:\n$err")
          }
        (stat("Total read bytes: "), stat("Total read ops: "), wire.get)
      } finally server.stop(0)
    }
    val (bytes1, _, _) = run(1)
    val (bytes3, ops3, wire3) = run(3)
    assert(bytes3 == 3 * bytes1,
      s"fan-out accounting drifted: 3x$bytes1 expected, got $bytes3")
    assert(bytes3 > 0 && bytes3 <= wire3,
      s"stat $bytes3 B exceeds wire $wire3 B")
    assert(wire3 - bytes3 <= ops3 * window,
      s"wire $wire3 B vs stat $bytes3 B — slack beyond $ops3 ops x $window")
  }

  test("flagship on laghos schema: boundary rows excluded, sorted by E") {
    val df = Seq(
      (1, 1.55, 1.55, 1.55, 10.0),  // inside
      (1, 1.55, 1.55, 1.55, 20.0),  // inside, same key
      (2, 1.5, 1.55, 1.55, 5.0),    // x on boundary → excluded
      (3, 1.55, 1.55, 1.55, 1.0)    // inside, smaller avg → first
    ).toDF("vertex_id", "x", "y", "z", "e")
    val got = df.filter($"x" > 1.5 && $"x" < 1.6 &&
                        $"y" > 1.5 && $"y" < 1.6 &&
                        $"z" > 1.5 && $"z" < 1.6)
      .groupBy($"vertex_id")
      .agg(min($"vertex_id").as("VID"), avg($"e").as("E"))
      .select("VID", "E")
      .orderBy(asc_nulls_last("E"))
      .as[(Int, Double)].collect()
    assert(got.toSeq == Seq((3, 1.0), (1, 15.0)))
  }
}
