package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.windowHash60

/** The native WindowHash60 expression must agree with the column
  * spelling (md5hash60 over the space-joined K-window — the arithmetic
  * the DuckDB oracle keeps) in both codegen and interpreted evaluation,
  * and with an in-memory reference. */
class WindowHash60Spec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def ref(tok: Seq[String], k: Int): Seq[Long] =
    if (tok.length < k) Nil
    else tok.sliding(k).map(w =>
      java.lang.Long.parseLong(md5hex(w.mkString(" ")).take(15), 16)).toSeq

  test("window_hash60 matches the HOF/column spelling on random docs") {
    val rnd = new scala.util.Random(67)
    val words = Vector("a", "the", "spark", "zz9", "", "Ω", "中文", "tok8")
    val rows = (1 to 150).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(20) + 1)(words(rnd.nextInt(words.size))))
    }
    val k = 8
    val df = rows.toDF("id", "tok")
    val hof = df.filter(size($"tok") >= k)
      .select($"id", expr(
        s"""transform(sequence(0, size(tok) - $k),
              i -> CAST(conv(substring(md5(CAST(concat_ws(' ',
                     slice(tok, i + 1, $k)) AS BINARY)), 1, 15), 16, 10)
                   AS BIGINT))""").as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val fast = df.filter(size($"tok") >= k)
      .select($"id", windowHash60($"tok", k).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast == hof)
    // and both match the in-memory reference
    val expect = rows.filter(_._2.length >= k)
      .map { case (id, tok) => id -> ref(tok, k) }.toMap
    assert(fast == expect)
    assert(fast.nonEmpty && fast.values.exists(_.nonEmpty))
  }

  test("window_hash60 survives interpreted (non-codegen) evaluation") {
    val prevW = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevF = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val tok = Seq("key", "agg", "row", "scan")
      val got = Seq(Tuple1(tok)).toDF("tok")
        .select(windowHash60($"tok", 3)).as[Seq[Long]].head()
      assert(got == ref(tok, 3) && got.size == 2)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevW)
      spark.conf.set("spark.sql.codegen.factoryMode", prevF)
    }
  }

  test("window_hash60 edges: short doc, exact-K doc, null array") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))),          // n < K -> empty
      (2L, Some(Seq("a", "b", "c"))),     // n == K -> one window
      (3L, None)
    ).toDF("id", "tok")
    val got = df.select($"id", windowHash60($"tok", 3).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1)))).toMap
    assert(got(1L) == Some(Seq.empty[Long]))
    assert(got(2L) == Some(ref(Seq("a", "b", "c"), 3)))
    assert(got(3L) == None)
  }

  test("null ELEMENT hashes as empty string: the DOCUMENTED divergence") {
    // Contract (WindowHash60 scaladoc / FastTextBucketsHelper): token
    // arrays come from split()-style tokenization, which never yields
    // null elements. A null element joins into the window as the empty
    // string — DIVERGING from the oracle's concat_ws(NULL) semantics
    // (concat_ws SKIPS nulls, shrinking the joined window). Pinned here,
    // mirroring CmBucketsSpec's null-key test, so a caller feeding a
    // null-bearing array can't mistake the behaviors for agreeing.
    val tok: Seq[Option[String]] = Seq(Some("a"), None, Some("b"))
    val got = Seq((1L, tok)).toDF("id", "tok")
      .select(windowHash60($"tok", 3)).as[Seq[Long]].head()
    assert(got == ref(Seq("a", "", "b"), 3),
      "null array elements must keep hashing as \"\" — if this changed, " +
        "revisit the WindowHash60 null-element contract")
    assert(got != ref(Seq("a", "b"), 3) && got != ref(Seq("a b"), 3),
      "a null element is NOT skipped (that would be concat_ws's " +
        "NULL-skipping shape, which this kernel does not implement)")
  }
}
