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

    // Frame sampling over the binary payload — the video-shaped plumbing
    // step: treat the payload as fixed 256-byte "frames", keep every 4th
    // (the deterministic stand-in for keyframe selection), fingerprint
    // each kept frame, roll up per document. The byte slicing, frame
    // index explode and per-frame hashing are the REAL Spark shapes a
    // codec-backed sampler needs (per-row Generate + binary substring —
    // no shuffle before the output sort); only "what is a frame" is the
    // stand-in. Exactly expressible in both engines (substring/md5 on
    // binary; q_mm_meta already pins byte-level parity via sha256).
    "q_mm_frames" -> ((s, d) => {
      val frameB = 256
      payloads(s, d)
        .select(col("doc_id"),
          col("payload"), octet_length(col("payload")).as("len"))
        .filter(col("len") > 0)
        .withColumn("n_frames", expr(s"(len + ${frameB - 1}) DIV $frameB"))
        .select(col("doc_id"), col("payload"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("fidx"))
        .filter(col("fidx") % 4 === 0)
        .select(col("doc_id"), col("n_frames"), col("fidx"),
          md5hash32(
            expr(s"substring(payload, CAST(fidx * $frameB + 1 AS INT), " +
                 s"$frameB)")).as("fp"))
        .groupBy(col("doc_id"))
        .agg(max(col("n_frames")).as("n_frames"),
             count(lit(1)).as("n_sampled"),
             sum(col("fp")).as("frames_fp"))
        .orderBy("doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // DuckDB cannot slice BLOBs, so the oracle slices the VARCHAR: for
    // this ASCII fixture byte offsets == char offsets and md5(VARCHAR)
    // hashes the same UTF-8 bytes (the equivalence q_mm_meta's sha256
    // oracle already pins). The Spark side is genuinely byte-level.
    "q_mm_frames" -> """
      WITH p AS (SELECT doc_id, text,
                        octet_length(CAST(text AS BLOB)) AS len
                 FROM documents
                 WHERE octet_length(CAST(text AS BLOB)) > 0),
      f AS (SELECT doc_id, text,
                   (len + 255) // 256 AS n_frames
            FROM p),
      e AS (SELECT doc_id, text, n_frames,
                   unnest(range(0, n_frames)) AS fidx
            FROM f),
      k AS (SELECT doc_id, n_frames, fidx,
                   CAST(('0x' || substr(md5(
                     substring(text, CAST(fidx * 256 + 1 AS INT), 256)),
                     1, 8)) AS BIGINT) AS fp
            FROM e WHERE fidx % 4 = 0)
      SELECT doc_id, CAST(max(n_frames) AS BIGINT) AS n_frames,
             count(*) AS n_sampled,
             CAST(sum(fp) AS BIGINT) AS frames_fp
      FROM k
      GROUP BY doc_id
      ORDER BY doc_id""",

    "q_mm_meta" -> """
      SELECT doc_id, lang,
             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_bytes,
             sha256(text) AS checksum
      FROM documents
      ORDER BY doc_id""",
  )
}
