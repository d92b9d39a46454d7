package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import graft.io.GraftHttpFileSystem

/** Minimal HTTP object server shared by the filesystem and runner-CLI
  * suites: HEAD (Content-Length) + ranged GET over the files of one
  * directory — the subset of an object-store API a scan needs. With
  * `auth` set, every request must carry the matching HMAC Authorization
  * header (GraftHttpFileSystem.signFor) or it is refused with 401 —
  * the server side of the credential surface the runner's -i/-k flags
  * configure. */
object TestHttpObjectServer {
  def serve(dir: String, auth: Option[(String, String)] = None,
            bytesServed: Option[java.util.concurrent.atomic.AtomicLong] =
              None): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = try {
        val expected = GraftHttpFileSystem.signFor(
          auth, ex.getRequestMethod, ex.getRequestURI.getPath)
        if (expected.exists(sig =>
            Option(ex.getRequestHeaders.getFirst("Authorization"))
              .forall(_ != sig))) {
          ex.sendResponseHeaders(401, -1); return
        }
        val p = Paths.get(dir, ex.getRequestURI.getPath)
        if (!Files.exists(p)) { ex.sendResponseHeaders(404, -1); return }
        val bytes = Files.readAllBytes(p)
        ex.getRequestMethod match {
          case "HEAD" =>
            ex.getResponseHeaders.add("Content-Length", bytes.length.toString)
            ex.sendResponseHeaders(200, -1)
          case _ =>
            Option(ex.getRequestHeaders.getFirst("Range")) match {
              case Some(r) =>
                val spec = r.stripPrefix("bytes=").split("-", 2)
                val lo = spec(0).toInt
                val hi = if (spec(1).isEmpty) bytes.length - 1 else spec(1).toInt
                val chunk = bytes.slice(lo, math.min(hi, bytes.length - 1) + 1)
                ex.getResponseHeaders.add(
                  "Content-Range", s"bytes $lo-$hi/${bytes.length}")
                ex.sendResponseHeaders(206, chunk.length)
                ex.getResponseBody.write(chunk)
                bytesServed.foreach(_.addAndGet(chunk.length.toLong))
              case None =>
                ex.sendResponseHeaders(200, bytes.length)
                ex.getResponseBody.write(bytes)
                bytesServed.foreach(_.addAndGet(bytes.length.toLong))
            }
        }
      } finally ex.close() // every path, or keep-alive clients stall
    })
    server.start()
    server
  }
}

/** End-to-end remote-object-store execution: the flagship query runs
  * against parquet served by an in-process HTTP object server through
  * the ghttp:// monitored filesystem — the sandbox-faithful analog of
  * the reference's s3-over-plain-HTTP profile (its object store speaks
  * HTTP too; runner.cc:210 disables SSL), with the reference's read-op /
  * byte accounting checked against real wire traffic. */
class HttpFsSpec extends SparkTestBase {
  import TestHttpObjectServer.serve

  test("flagship query executes against the HTTP object profile with op accounting") {
    val server = serve(sf0001)
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.ghttp.impl", "graft.io.GraftHttpFileSystem")
      val remoteDir = s"ghttp://127.0.0.1:${server.getAddress.getPort}"
      GraftHttpFileSystem.resetCounters()
      val remote = ops.ScanFilterOps.queries("q_scan_flagship")(spark, remoteDir)
        .collect().toSeq
      val (gets, heads, bytes) = GraftHttpFileSystem.snapshot
      val local = ops.ScanFilterOps.queries("q_scan_flagship")(spark, sf0001)
        .collect().toSeq
      assert(remote == local, "remote result differs from local")
      assert(gets > 0 && heads > 0, s"no wire traffic counted ($gets/$heads)")
      // metadata cache (reference README.md:98): however many times the
      // file index stats the object during the query, one object = at
      // most one wire HEAD
      assert(heads <= 1, s"$heads HEADs for one object — metadata cache miss")
      // scale posture over the wire: projection + filter pushdown mean the
      // scan must NOT fetch the whole object — footer + the 5 referenced
      // column chunks only (the reference reads 208 KB of its multi-MB
      // file the same way, README.md:89)
      val fileSize = Files.size(Paths.get(sf0001, "lineitem.parquet"))
      assert(bytes > 0 && bytes < fileSize,
        s"read $bytes of $fileSize-byte object — column pruning not effective")
    } finally server.stop(0)
  }

  test("credentialed object server: anonymous reads 401, signed reads succeed") {
    val creds = ("TESTKEY", "TESTSECRET")
    val server = serve(sf0001, auth = Some(creds))
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      conf.set("fs.ghttp.impl", "graft.io.GraftHttpFileSystem")
      val remoteDir = s"ghttp://127.0.0.1:${server.getAddress.getPort}"
      // no credentials configured → the server refuses the HEAD with 401
      // and the failure names the missing conf keys
      conf.unset("fs.ghttp.auth.id"); conf.unset("fs.ghttp.auth.secret")
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      val e = intercept[Exception] {
        ops.ScanFilterOps.queries("q_scan_flagship")(spark, remoteDir).collect()
      }
      assert(chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("401"))), s"expected a 401 failure, got $e")
      // with the pair set, every request is signed and the result matches
      // local (fresh authority → fresh FS instance picking up the conf)
      conf.set("fs.ghttp.auth.id", creds._1)
      conf.set("fs.ghttp.auth.secret", creds._2)
      val server2 = serve(sf0001, auth = Some(creds))
      try {
        val authedDir = s"ghttp://127.0.0.1:${server2.getAddress.getPort}"
        val remote = ops.ScanFilterOps.queries("q_scan_flagship")(spark, authedDir)
          .collect().toSeq
        val local = ops.ScanFilterOps.queries("q_scan_flagship")(spark, sf0001)
          .collect().toSeq
        assert(remote == local, "signed remote result differs from local")
      } finally server2.stop(0)
    } finally {
      server.stop(0)
      spark.sparkContext.hadoopConfiguration.unset("fs.ghttp.auth.id")
      spark.sparkContext.hadoopConfiguration.unset("fs.ghttp.auth.secret")
    }
  }

  test("ghttp is read-only: writes are refused") {
    val server = serve(sf0001)
    try {
      spark.sparkContext.hadoopConfiguration
        .set("fs.ghttp.impl", "graft.io.GraftHttpFileSystem")
      val port = server.getAddress.getPort
      val e = intercept[Exception] {
        spark.range(3).write.mode("overwrite")
          .parquet(s"ghttp://127.0.0.1:$port/out.parquet")
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("read-only"))))
    } finally server.stop(0)
  }
}
