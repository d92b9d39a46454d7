package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star, BASELINE.json:6): media treated
  * as opaque `binary` payloads with typed metadata travelling alongside.
  *
  * The decode step itself is a clearly-marked deterministic stub (the
  * container has no image/audio codecs — SURVEY.md §2.3): what is real and
  * tested is the Spark-side contract — binary column + metadata schema, the
  * per-partition batch iteration shape (`mapPartitions`, the Scala analog
  * of `mapInPandas`), and partitioning that keeps payloads off the driver.
  */
object MultimodalOps {

  /** Output schema of the fake decoder. Metadata columns that arrive WITH
    * the payload (here `lang`) ride through the decode pass instead of
    * being re-attached by a post-decode join: at 100x that join is a
    * 2x50M-row shuffle for information the scan already had in hand. */
  val decodeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = true),
    StructField("payload_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** STUB decode: a real implementation would hand `payload` to an image
    * codec here. The fake derives deterministic "pixels" from the bytes so
    * the plumbing (schema, batching, partition parallelism) is testable. */
  private def fakeDecode(docId: Long, lang: String,
                         payload: Array[Byte]): Row = {
    val w = 16 + (payload.length % 64)
    val h = 16 + ((payload.length / 64) % 64)
    val luma =
      if (payload.isEmpty) 0.0
      else payload.map(b => (b & 0xff).toDouble).sum / payload.length
    Row(docId, lang, payload.length.toLong, w, h, luma)
  }

  /** Binary-payload frame: text bytes stand in for media bytes. */
  def payloads(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        col("text").cast("binary").as("payload"))

  /** Distributed decode over binary payloads — one batch per partition,
    * nothing collected to the driver. */
  def decode(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodeSchema)
    payloads(s, d)
      .select(col("doc_id"), col("lang"), col("payload"))
      .mapPartitions { rows =>
        rows.map(r => fakeDecode(r.getLong(0), r.getString(1),
          r.getAs[Array[Byte]](2)))
      }(enc)
  }

  val queries: Map[String, QB] = Map(
    // Metadata extraction over the binary payload — oracle-matched (byte
    // length and sha256 are engine-independent).
    "q_mm_meta" -> ((s, d) =>
      payloads(s, d)
        .select(col("doc_id"), col("lang"),
          octet_length(col("payload")).cast("long").as("payload_bytes"),
          sha2(col("payload"), 256).as("checksum"))
        .orderBy("doc_id")),

    // Decode + per-language feature aggregation — Spark-only (the decoder
    // stub is not expressible in SQL); driver records a rows-only check.
    "q_mm_decode" -> ((s, d) =>
      decode(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
             r6(davg(col("mean_luma"))).as("avg_luma"),
             max(col("width")).as("max_w"),
             max(col("height")).as("max_h"))
        .orderBy("lang")),
  )

  val oracles: Map[String, String] = Map(
    "q_mm_meta" -> """
      SELECT doc_id, lang,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_bytes,
             sha256(text) AS checksum
      FROM documents
      ORDER BY doc_id""",
  )
}
