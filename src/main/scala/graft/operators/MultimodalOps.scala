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

  val queries: Map[String, Q] = Map(
    "q31_multimodal_decode" -> q31MultimodalDecode,
    "q43_frame_sample" -> q43FrameSample,
  )
  val oracle: Map[String, String] = Map(
    "q31_multimodal_decode" -> q31Sql,
    "q43_frame_sample" -> q43Sql,
  )
}
