package graft

import org.apache.spark.sql.functions._

/** Fixture-drift tripwire (round-11 postmortem): the driver regenerates
  * /root/testdata between rounds and has already shifted a column's
  * physical type once — events.ts went timestamp[ns] → timestamp[us]
  * mid-round, which silently crashed 20 batch queries and corrupted 7
  * streaming answers before anything named the cause. This spec pins, per
  * fixture table, the column names and the set of ACCEPTED Spark-resolved
  * types; any drift fails loudly with the observed schema, so a future
  * regeneration produces one diagnostic line instead of 27 opaque
  * failures.
  *
  * Time-typed columns accept every representation the readers are built
  * to normalize (raw int64 ns under nanosAsLong, timestamp_ntz, session
  * timestamp) — the tripwire is for NEW representations, not for the ones
  * schema-on-read already covers.
  */
class FixtureDriftSpec extends SparkTestBase {

  // column -> accepted Spark typeName set; single string = exactly that.
  private val ts = Set("long", "timestamp", "timestamp_ntz")
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
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

  test("every fixture table resolves to an accepted physical schema") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
      val observed = spark.read.parquet(s"$sf0001/$name.parquet")
        .schema.fields.map(f => f.name -> f.dataType.typeName)
      val colDrift =
        if (observed.map(_._1).toSeq != cols.map(_._1))
          Seq(s"$name: column set drifted — observed " +
            observed.map { case (n, t) => s"$n:$t" }.mkString("(", ", ", ")"))
        else cols.zip(observed).collect {
          case ((cname, ok), (_, got)) if !ok.contains(got) =>
            s"$name.$cname: $got (accepted: ${ok.mkString("/")})"
        }
      colDrift
    }
    assert(drift.isEmpty,
      s"\nFIXTURE DRIFT — regenerate-proof the readers before anything " +
      s"else this round:\n  ${drift.mkString("\n  ")}")
  }

  test("normalized events.ts lands in the fixture's real epoch") {
    // A unit error (ns read as µs or vice versa) lands decades away from
    // the generated 2024 corpus — exactly the r11 failure mode where a
    // month of events compressed into 43 minutes of 1970-01-20.
    val mm = graft.ops.table(spark, sf0001, "events")
      .agg(year(min(col("ts"))).as("lo"), year(max(col("ts"))).as("hi"))
      .head()
    val (lo, hi) = (mm.getInt(0), mm.getInt(1))
    assert(lo >= 2015 && hi <= 2035,
      s"events.ts normalized to years [$lo, $hi] — unit mismatch between " +
      "the fixture's physical type and the reader's conversion")
    // streaming sniff agrees with the batch read
    val sniffed = graft.streaming.StreamOps.eventsTsType(spark, sf0001)
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
      .schema("ts").dataType
    assert(sniffed == raw, s"stream sniff $sniffed != batch raw $raw")
  }
}
