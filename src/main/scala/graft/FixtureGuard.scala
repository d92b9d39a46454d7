package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixture-drift tripwire, shared by FixtureDriftSpec (sbt test) and
  * Verify.main (the driver path). The driver regenerates /root/testdata
  * between rounds and has twice shifted a column's physical type
  * mid-round (events.ts ns→µs, r11), which silently broke dozens of
  * queries before anything named the cause. Running the same pin as a
  * Verify preamble turns the next regeneration into one diagnostic line
  * and a nonzero exit BEFORE any query runs — the sbt-only spec couldn't
  * fire on the driver's own invocation.
  */
object FixtureGuard {

  /** column -> accepted Spark typeName set. Time-typed columns accept
    * every representation the readers normalize (raw int64 ns under
    * nanosAsLong, timestamp_ntz, session timestamp) — the tripwire is for
    * NEW representations, not the ones schema-on-read already covers. */
  private val ts = Set("long", "timestamp", "timestamp_ntz")
  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("integer"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("integer"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("integer")),
    "customer" -> Seq("c_custkey" -> Set("long"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("integer"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("long"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("integer"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("long"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("integer"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("long"), "o_custkey" -> Set("long"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("long"), "l_partkey" -> Set("long"),
      "l_suppkey" -> Set("long"), "l_linenumber" -> Set("integer"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> ts),
    "events" -> Seq("event_id" -> Set("long"), "ts" -> ts,
      "user_id" -> Set("long"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("long"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("long")),
    "embeddings" -> Seq("vec_id" -> Set("long"),
      "embedding" -> Set("array"), "label" -> Set("integer")),
  )

  /** Every table()-normalized time column, pinned to the fixture's real
    * epoch: 'long' in the accepted set above is only safe BECAUSE the
    * reader converts it, and a unit error (ns read as µs or vice versa)
    * lands decades away from the generated corpus. */
  val epochPins: Seq[(String, String)] =
    Seq("events" -> "ts", "orders" -> "o_orderdate",
        "lineitem" -> "l_shipdate")

  /** All drift diagnostics for the fixture set under `dir`; empty = ok. */
  def drift(spark: SparkSession, dir: String): Seq[String] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Only a MISSING fixture is "not drift" (the documented
    // Verify-on-missing-dir contract: exit 0, oracle_sql.json still
    // written, per-query try/catch logs one failure per query). A
    // fixture that EXISTS but cannot be read — corrupt footer, broken
    // permissions — is exactly the silent breakage this tripwire is
    // for, so it surfaces as a diagnostic instead of being swallowed
    // by a blanket Try (the r14-advice hole).
    val readable = scala.collection.mutable.Set[String]()
    val schemaDrift = expected.toSeq.sortBy(_._1).flatMap {
      case (name, cols) =>
        val path = s"$dir/$name.parquet"
        // File.exists() only answers for plain local paths; a scheme'd
        // dir (file:/, hdfs://, s3a://…) that Spark can read must fall
        // through to the read attempt or the tripwire silently disarms
        // for exactly those dirs. A read failure that is just
        // path-not-found stays "missing ≠ drifted".
        val plainLocalMissing =
          !path.contains(":/") && !new java.io.File(path).exists()
        // Missing-vs-unreadable classification keys on the error CLASS
        // (SparkThrowable condition), not message text — a Spark
        // version or locale rewording the message must not turn a
        // merely-missing scheme'd path into a spurious "present but
        // unreadable" diagnostic. Fallback: ask the filesystem itself
        // (Hadoop FileSystem.exists handles every scheme Spark reads).
        def isPathNotFound(e: Throwable): Boolean = e match {
          case st: org.apache.spark.SparkThrowable
              if st.getCondition != null =>
            st.getCondition.contains("PATH_NOT_FOUND")
          case _ => scala.util.Try {
            val p = new org.apache.hadoop.fs.Path(path)
            !p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
          }.getOrElse(false)
        }
        if (plainLocalMissing) Nil // missing ≠ drifted
        else scala.util.Try(spark.read.parquet(path)
            .schema.fields.map(f => f.name -> f.dataType.typeName)) match {
          case scala.util.Failure(e) if isPathNotFound(e) => Nil
          case scala.util.Failure(e) =>
            Seq(s"$name: fixture present but unreadable — " +
              s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator
                .take(1).mkString.take(160))
          case scala.util.Success(observed) =>
            readable += name
            if (observed.map(_._1).toSeq != cols.map(_._1))
              Seq(s"$name: column set drifted — observed " +
                observed.map { case (n, t) => s"$n:$t" }
                  .mkString("(", ", ", ")"))
            else cols.zip(observed).collect {
              case ((cname, ok), (_, got)) if !ok.contains(got) =>
                s"$name.$cname: $got (accepted: ${ok.mkString("/")})"
            }
        }
    }
    // Only epoch-check tables that are readable AND whose schema passed —
    // a drifted schema may not normalize at all; a missing one is the
    // per-query path's failure to report. An epoch check that THROWS on
    // a readable, schema-clean table is itself a diagnostic (this is the
    // very unit-mismatch path the pin guards), not a silent skip.
    val badTables = schemaDrift.map(_.takeWhile(c => c != '.' && c != ':'))
    val epochDrift = epochPins
      .filter(p => readable.contains(p._1) && !badTables.contains(p._1))
      .flatMap { case (tbl, c) =>
        scala.util.Try {
          val mm = graft.ops.table(spark, dir, tbl)
            .agg(year(min(col(c))).as("lo"), year(max(col(c))).as("hi"))
            .head()
          (mm.getInt(0), mm.getInt(1))
        } match {
          case scala.util.Failure(e) =>
            Some(s"$tbl.$c: epoch-pin check failed to evaluate — " +
              s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator
                .take(1).mkString.take(160))
          case scala.util.Success((lo, hi)) =>
            if (lo >= 1990 && hi <= 2035) None
            else Some(s"$tbl.$c normalized to years [$lo, $hi] — unit " +
              "mismatch between the fixture's physical type and the " +
              "reader's conversion")
        }
      }
    // q_mm_frames' oracle equivalence (Spark byte-slicing + md5-of-binary
    // vs DuckDB VARCHAR char-slicing + md5-of-string) holds only while
    // documents.text is single-byte — a checked invariant, not an
    // undeclared fixture property: a regenerated fixture with multibyte
    // text fails loudly here instead of silently diverging.
    val asciiDrift =
      if (readable.contains("documents") && !badTables.contains("documents"))
        scala.util.Try {
          graft.ops.table(spark, dir, "documents")
            .filter(octet_length(col("text")) =!= length(col("text")))
            .count()
        } match {
          case scala.util.Success(0L) => Nil
          case scala.util.Success(n) =>
            Seq(s"documents.text: $n rows contain multibyte characters — " +
              "q_mm_frames' byte-slice vs char-slice oracle equivalence " +
              "no longer holds")
          case scala.util.Failure(e) =>
            Seq("documents.text: single-byte pin failed to evaluate — " +
              s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator
                .take(1).mkString.take(160))
        }
      else Nil
    schemaDrift ++ epochDrift ++ asciiDrift
  }
}
