package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction as a
  * partition-local batch operator.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * container — see the builder prompt): [[stubDecode]] derives a
  * deterministic fake feature vector from the payload bytes. Everything
  * around it — the binary column, the metadata struct, the mapPartitions
  * batch shape, the output schema — is the real plumbing a production
  * decoder drops into.
  *
  * Scale notes: decode is per-row CPU-bound work with no shuffle; the
  * mapPartitions boundary amortizes per-batch library init (the expensive
  * part of real decoders) exactly like Python's `mapInPandas` batches.
  * Payload bytes stay off the shuffle: downstream aggregations only carry
  * the (small) feature vectors and metadata.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  /** Media record: opaque payload + typed metadata (the schema a real
    * image/audio table would carry). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("source", StringType, nullable = true))), nullable = false)))

  /** Deterministic decode stub: "decodes" a payload into an 8-dim feature
    * vector from byte statistics (sum, min, max, first/last bytes, length
    * buckets). A real decoder (JPEG → pixels → embedding) replaces ONLY
    * this function; signature and batch shape stay.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b; if (b < mn) mn = b; if (b > mx) mx = b
      i += 1
    }
    val n = math.max(1, payload.length)
    Array(
      payload.length.toFloat,
      (sum.toDouble / n).toFloat,
      mn.toFloat, mx.toFloat,
      (if (payload.nonEmpty) payload(0) & 0xff else 0).toFloat,
      (if (payload.nonEmpty) payload(payload.length - 1) & 0xff else 0).toFloat,
      (sum % 251).toFloat,
      (payload.length % 17).toFloat)
  }

  /** The partition-local decode operator: binary-in, features-out, batched
    * per partition (library init would happen once per partition here). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = media.schema.fieldIndex("payload")
    val keepIdx = media.schema.fields.indices.filterNot(_ == payloadIdx)
    val rdd = media.rdd.mapPartitions { rows =>
      // per-partition init happens here (decoder handles, model weights…)
      rows.map { r =>
        val feats = stubDecode(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(keepIdx.map(r.get) :+ feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** q31: end-to-end multimodal pipeline over `documents`: text payload →
    * binary media record with metadata → decode-stub features → per-source
    * feature aggregation. The whole query is oracle-checkable because the
    * stub's features are byte arithmetic DuckDB can replicate.
    */
  val q31MultimodalDecode: Q = (s, d) => {
    val media = documents(s, d).select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("source")).as("meta"))
    val decoded = decodeFeatures(media)
    decoded.select(
      col("doc_id"), col("media_type"),
      col("meta.n_bytes").as("n_bytes"), col("meta.source").as("source"),
      col("features")(0).cast("int").as("f_len"),
      round(col("features")(1).cast("double"), 3).as("f_mean_byte"),
      col("features")(2).cast("int").as("f_min_byte"),
      col("features")(3).cast("int").as("f_max_byte"),
      col("features")(6).cast("int").as("f_checksum"))
      .orderBy("doc_id")
  }
  // The stub's byte stats over UTF-8 text == char stats DuckDB can compute:
  // the synthetic documents are ASCII, so bytes == code points.
  val q31Sql: String =
    """WITH bytes AS (
      |  SELECT doc_id, source, encode(text) AS payload,
      |         list_transform(range(1, LENGTH(text) + 1),
      |                        i -> ascii(SUBSTR(text, CAST(i AS INT), 1))) AS bs
      |  FROM documents)
      |SELECT doc_id, 'text/plain' AS media_type,
      |  octet_length(payload) AS n_bytes, source,
      |  octet_length(payload) AS f_len,
      |  ROUND(CAST(CAST(CAST(list_sum(bs) AS DOUBLE) / GREATEST(1, octet_length(payload)) AS FLOAT) AS DOUBLE), 3) AS f_mean_byte,
      |  list_min(bs) AS f_min_byte,
      |  list_max(bs) AS f_max_byte,
      |  CAST(list_sum(bs) % 251 AS INT) AS f_checksum
      |FROM bytes ORDER BY doc_id""".stripMargin

  /** Resize stub: downsample a payload by averaging each `factor`-byte
    * block (the "thumbnail" shape: binary in, smaller binary out). A real
    * image resize replaces only this function; the schema (binary→binary)
    * and the narrow per-row execution are the production plumbing. */
  def stubResize(payload: Array[Byte], factor: Int): Array[Byte] = {
    if (payload.isEmpty) return Array.emptyByteArray
    val out = new Array[Byte]((payload.length + factor - 1) / factor)
    var o = 0
    while (o < out.length) {
      val start = o * factor
      val end = math.min(start + factor, payload.length)
      var sum = 0
      var i = start
      while (i < end) { sum += payload(i) & 0xff; i += 1 }
      out(o) = (sum / (end - start)).toByte
      o += 1
    }
    out
  }

  /** Frame sampling: split a payload into fixed-size frames and keep every
    * `stride`-th — the video-pipeline shape (one media row → many frame
    * rows, the UDTF/explode form). Emits per-frame byte features; a real
    * decoder swaps the feature step, the explode stays. */
  private val frameFeatures = udf { (payload: Array[Byte]) =>
    val frameSize = 100; val stride = 2
    val nFrames = (payload.length + frameSize - 1) / frameSize
    (0 until nFrames).filter(_ % stride == 0).map { f =>
      val start = f * frameSize
      val end = math.min(start + frameSize, payload.length)
      var sum = 0L
      var i = start
      while (i < end) { sum += payload(i) & 0xff; i += 1 }
      (f, end - start, (sum % 251).toInt)
    }
  }

  /** q43: frame sampling over `documents` as synthetic media — 100-byte
    * frames, every 2nd kept, per-frame length + checksum. One narrow pass
    * + explode; frames never shuffle (the aggregation downstream would
    * carry only features). Oracle-checkable because the synthetic docs are
    * ASCII (bytes == code points, as q31). */
  val q43FrameSample: Q = (s, d) => {
    documents(s, d)
      .select(col("doc_id"),
        explode(frameFeatures(encode(col("text"), "UTF-8"))).as("f"))
      .select(col("doc_id"), col("f._1").as("frame_idx"),
        col("f._2").as("n_bytes"), col("f._3").as("checksum"))
      .orderBy("doc_id", "frame_idx")
  }
  val q43Sql: String =
    """WITH fi AS (
      |  SELECT doc_id, text,
      |    unnest(range(0, CAST(CEIL(LENGTH(text) / 100.0) AS BIGINT))) AS i
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
      |    SUBSTR(text, CAST(i * 100 + 1 AS INT), 100) AS frame
      |  FROM fi WHERE i % 2 = 0)
      |SELECT doc_id, frame_idx, LENGTH(frame) AS n_bytes,
      |  CAST(list_sum(list_transform(range(1, LENGTH(frame) + 1),
      |       j -> ascii(SUBSTR(frame, CAST(j AS INT), 1)))) % 251 AS INT) AS checksum
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Parse image dimensions from real PNG / JPEG header bytes — pure byte
    * arithmetic, no image library. Returns (format, width, height) or null
    * when the payload is neither.
    *
    *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *    chunk (always first): 4-byte length + "IHDR" + width/height as
    *    big-endian u32 at offsets 16 and 20.
    *  - JPEG: SOI `FF D8`, then a MARKER SCAN — segments are
    *    `FF <marker> <len:be16> <payload>` with variable lengths (APP0,
    *    EXIF, comments …) until a start-of-frame marker (C0–CF except the
    *    non-SOF C4/C8/CC), whose payload is precision:u8, height:be16,
    *    width:be16. This is the part a fixed-offset reader gets wrong on
    *    real files.
    *
    * This is the production header-sniff pass of an image-ingest pipeline
    * (dimension filtering, aspect bucketing, decode-cost estimation) —
    * per-row byte arithmetic at scan speed, no shuffle, payload never
    * leaves the partition. */
  def parseImageDims(payload: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (payload.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4e && u8(3) == 0x47 &&
        u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R') {
      Some(("png", be32(16).toInt, be32(20).toInt))
    } else if (payload.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 <= payload.length) {
        if (u8(i) != 0xff) return None // desynced — not a marker boundary
        val m = u8(i + 1)
        if (m == 0xd9 || m == 0xda) return None // EOI / scan data: no SOF seen
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) return Some(("jpeg", be16(i + 7), be16(i + 5)))
        i += 2 + be16(i + 2)
      }
      None
    } else None
  }

  /** q93: image-header metadata extraction as a gate query. The testdata
    * has no real media files, so each document deterministically becomes a
    * synthetic-but-structurally-REAL image payload (valid PNG signature +
    * IHDR, or valid JPEG marker stream with variable-length APP0/COM
    * segments before the SOF — built from hex in BOTH engines, so the
    * binary is bit-identical); [[parseImageDims]] then recovers
    * (format, width, height) from the BYTES — the real marker scan, which
    * the variable segment lengths force to actually walk the stream — and
    * the result aggregates by (source, format, resolution bucket).
    * ImageMetaSpec additionally pins the parser on golden bytes from
    * real-world files so builder+parser can't be consistently wrong. */
  val q93ImageMeta: Q = (s, d) => {
    val media = documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("w", (lit(16) + pmod(col("n_chars") * 5, lit(2000))).cast("int"))
      .withColumn("h", (lit(16) + pmod(col("doc_id") * 7, lit(2000))).cast("int"))
      .withColumn("pad0", pmod(col("doc_id"), lit(6)).cast("int"))
      .withColumn("pad1", pmod(col("doc_id") * 3, lit(5)).cast("int"))
      .withColumn("hx", expr(
        """CASE WHEN doc_id % 2 = 0 THEN
          |  concat('89504e470d0a1a0a', '0000000d', '49484452',
          |         lpad(lower(hex(w)), 8, '0'), lpad(lower(hex(h)), 8, '0'),
          |         '0806000000', '00000000')
          |ELSE
          |  concat('ffd8',
          |         'ffe0', lpad(lower(hex(7 + pad0)), 4, '0'), '4a46494600',
          |         repeat('00', pad0),
          |         'fffe', lpad(lower(hex(2 + pad1)), 4, '0'), repeat('00', pad1),
          |         'ffc0', '0011', '08',
          |         lpad(lower(hex(h)), 4, '0'), lpad(lower(hex(w)), 4, '0'),
          |         '03011100021101031101', 'ffd9')
          |END""".stripMargin))
      .select(col("doc_id"), col("source"), unhex(col("hx")).as("payload"))
    val parse = udf { (p: Array[Byte]) => parseImageDims(p) }
    media.select(col("doc_id"), col("source"), parse(col("payload")).as("m"))
      .select(col("doc_id"), col("source"),
        col("m._1").as("fmt"), col("m._2").as("width"), col("m._3").as("height"))
      // a null fmt here means the parser failed on a payload the builder
      // swears is valid — it groups as a visible (source, null) row and
      // hash-mismatches the oracle, not silently dropped
      .groupBy(col("source"), col("fmt"),
        expr("CAST((CAST(width AS BIGINT) * height) DIV 200000 AS INT)").as("res_bucket"))
      .agg(count(lit(1)).as("n"),
        sum("width").as("sum_w"), sum("height").as("sum_h"),
        min("width").as("min_w"), max("height").as("max_h"))
      .orderBy("source", "fmt", "res_bucket")
  }
  /** Oracle: the SAME hex payload, parsed from the hex string (two chars
    * per byte — `CAST('0x'||substr(...) AS INT)` is DuckDB's byte read),
    * including the genuine JPEG marker walk across the two variable-length
    * segments. */
  val q93Sql: String =
    """WITH img AS (
      |  SELECT doc_id, source,
      |    16 + (n_chars * 5) % 2000 AS w,
      |    16 + (doc_id * 7) % 2000 AS h,
      |    CAST(doc_id % 6 AS INT) AS pad0,
      |    CAST((doc_id * 3) % 5 AS INT) AS pad1
      |  FROM documents),
      |payload AS (
      |  SELECT doc_id, source,
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      '89504e470d0a1a0a' || '0000000d' || '49484452' ||
      |      lpad(to_hex(w), 8, '0') || lpad(to_hex(h), 8, '0') ||
      |      '0806000000' || '00000000'
      |    ELSE
      |      'ffd8' ||
      |      'ffe0' || lpad(to_hex(7 + pad0), 4, '0') || '4a46494600' || repeat('00', pad0) ||
      |      'fffe' || lpad(to_hex(2 + pad1), 4, '0') || repeat('00', pad1) ||
      |      'ffc0' || '0011' || '08' || lpad(to_hex(h), 4, '0') || lpad(to_hex(w), 4, '0') ||
      |      '03011100021101031101' ||
      |      'ffd9'
      |    END AS hx
      |  FROM img),
      |-- JPEG marker walk, replayed on the hex (2 chars/byte, 1-based
      |-- substr; byte B reads at position 2B+1): segment lengths are READ
      |-- from the stream via TRY_CAST('0x'||…) — NULL on the png rows —
      |-- not recomputed from pad0/pad1
      |walk1 AS (
      |  SELECT *,
      |    CASE WHEN doc_id % 2 <> 0 THEN
      |      4 + TRY_CAST(concat('0x', substr(hx, 9, 4)) AS BIGINT)
      |    END AS after_app0
      |  FROM payload),
      |walk2 AS (
      |  SELECT *,
      |    CASE WHEN doc_id % 2 <> 0 THEN
      |      after_app0 + 2 + TRY_CAST(concat('0x',
      |        substr(hx, CAST(after_app0 * 2 + 5 AS INT), 4)) AS BIGINT)
      |    END AS sof_off
      |  FROM walk1),
      |parsed AS (
      |  SELECT doc_id, source,
      |    CASE WHEN substr(hx, 1, 16) = '89504e470d0a1a0a' THEN 'png'
      |         WHEN substr(hx, 1, 4) = 'ffd8' THEN 'jpeg' END AS fmt,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN TRY_CAST(concat('0x', substr(hx, 33, 8)) AS BIGINT)
      |      ELSE TRY_CAST(concat('0x',
      |        substr(hx, CAST(sof_off * 2 + 15 AS INT), 4)) AS BIGINT)
      |    END AS width,
      |    CASE WHEN doc_id % 2 = 0
      |      THEN TRY_CAST(concat('0x', substr(hx, 41, 8)) AS BIGINT)
      |      ELSE TRY_CAST(concat('0x',
      |        substr(hx, CAST(sof_off * 2 + 11 AS INT), 4)) AS BIGINT)
      |    END AS height
      |  FROM walk2)
      |SELECT source, fmt,
      |  CAST((width * height) // 200000 AS INT) AS res_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(width) AS BIGINT) AS sum_w, CAST(SUM(height) AS BIGINT) AS sum_h,
      |  MIN(width) AS min_w, MAX(height) AS max_h
      |FROM parsed
      |GROUP BY 1, 2, 3 ORDER BY source, fmt, res_bucket""".stripMargin

  val queries: Map[String, Q] = Map(
    "q31_multimodal_decode" -> q31MultimodalDecode,
    "q43_frame_sample" -> q43FrameSample,
    "q93_image_meta" -> q93ImageMeta,
  )
  val oracle: Map[String, String] = Map(
    "q31_multimodal_decode" -> q31Sql,
    "q43_frame_sample" -> q43Sql,
    "q93_image_meta" -> q93Sql,
  )
}
