package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` payloads with
  * typed metadata, plus a batched feature-extraction stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE of the decode step — the Spark
  * plumbing around it (schema, binary columns, batched iteration,
  * partition-parallel execution, output shape) is real and tested.
  * Swapping `decodeStub` for a JNI/codec call is the only change a
  * production deployment would make.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); feature extraction is partition-parallel mapPartitions
  * with bounded per-batch memory (`batchSize` payloads in flight per
  * task — the Scala analog of a pandas-UDF batch). At 100 TB the
  * media table would be parquet with the payload column in its own
  * row-group-friendly column, and extraction is a pure map stage: no
  * shuffle at all.
  */
object MediaOps {

  /** Media row schema: id, format tag, opaque payload, typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("lang", StringType))), nullable = false)))

  /** Build the media table from `documents` (the corpus' stand-in for
    * a binary modality: payload = UTF-8 bytes of the text; a real
    * ingest would read image/audio files via binaryFile). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("blob/"), col("source")).as("format"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(col("text")).as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** STUB decoder — deterministic fake of a codec call. A real
    * implementation would decode `payload` (JPEG/PNG/WAV/...) and
    * compute model-ready features; this stands in with byte-level
    * statistics so the pipeline shape is testable offline. */
  private[multimodal] def decodeStub(payloadOrNull: Array[Byte]): Array[Double] = {
    // null payload (null source text) decodes like an empty one — a
    // decoder must not fail the whole job on one bad row
    val payload =
      if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
    var sum = 0L
    var mx = 0
    val seen = new java.util.BitSet(256)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      sum += b
      if (b > mx) mx = b
      seen.set(b)
      i += 1
    }
    val n = math.max(payload.length, 1)
    Array(payload.length.toDouble, sum.toDouble / n, mx.toDouble,
      seen.cardinality().toDouble)
  }

  /** Batched feature extraction: partition-parallel, `batchSize`
    * payloads decoded per batch (bounded memory per task — the batch
    * shape a vectorized/pandas decode stage would use). Output:
    * (doc_id, format, features array<double>, decoder tag). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "format", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real decoder would process the whole batch in one
          // vectorized/native call; the stub decodes per payload.
          batch.iterator.map { case (id, fmt, payload) =>
            (id, fmt, decodeStub(payload), "stub-v1")
          }
        }
      }
      .toDF("doc_id", "format", "features", "decoder")
  }

  /** STUB resize — deterministic fake of the image/audio resample
    * step: box-average the payload's bytes into `width` buckets
    * (bucket of byte i = i·width div len; floor of the bucket mean).
    * Payloads shorter than `width` yield one bucket per byte —
    * output length is min(len, width), never padding. A real
    * implementation is the same shape with a codec resample in place
    * of the byte average. */
  private[multimodal] def resizeStub(
      payloadOrNull: Array[Byte], width: Int): Array[Int] = {
    val p = if (payloadOrNull == null) Array.emptyByteArray else payloadOrNull
    if (p.isEmpty) return Array.empty
    val sums = new Array[Long](width)
    val counts = new Array[Long](width)
    var i = 0
    while (i < p.length) {
      val j = ((i.toLong * width) / p.length).toInt
      sums(j) += (p(i) & 0xff)
      counts(j) += 1
      i += 1
    }
    (0 until width).iterator.filter(counts(_) > 0)
      .map(j => (sums(j) / counts(j)).toInt).toArray
  }

  /** Batched resize stage (same mapPartitions batch shape as
    * extractFeatures). Output: (doc_id, out_len, resized array). */
  def resize(spark: SparkSession, media: DataFrame,
      width: Int = 64, batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val r = resizeStub(payload, width)
            (id, r.length, r)
          }
        }
      }
      .toDF("doc_id", "out_len", "resized")
  }
}
