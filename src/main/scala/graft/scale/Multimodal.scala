package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs per-partition over iterator batches (the Scala
  * analog of `mapInPandas` — rows stream through without materializing a
  * partition in memory). The actual codec is STUBBED (`decodeStub`) with a
  * deterministic fake — this container has no image/audio libs — but the
  * Spark-side contract (schema, batching, partition parallelism, metadata
  * propagation) is real and tested.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  final case class DecodedMeta(
      asset_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long, checksum: String)

  /** STUB decoder: derives deterministic fake media properties from the
    * payload bytes (first bytes → "dimensions", length → "duration").
    * Replace the body with a real codec (javax.imageio / ffmpeg bindings)
    * in production; the signature and the `mapPartitions` streaming shape
    * are what a 1000-executor decode job needs.
    */
  def decodeStub(df: DataFrame): Dataset[DecodedMeta] = {
    implicit val enc = Encoders.product[DecodedMeta]
    df.select(col("asset_id"), col("media_type"), col("payload"))
      .mapPartitions { it =>
        it.map { row =>
          val id = row.getLong(0)
          val mt = row.getString(1)
          val bytes = if (row.isNullAt(2)) Array.emptyByteArray else row.getAs[Array[Byte]](2)
          val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
          val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
          val crc = new java.util.zip.CRC32()
          crc.update(bytes)
          DecodedMeta(id, mt, bytes.length.toLong,
            width = 16 + (b0 % 64) * 16, height = 16 + (b1 % 64) * 16,
            duration_ms = bytes.length.toLong * 7L,
            checksum = java.lang.Long.toHexString(crc.getValue))
        }
      }
  }

  /** Wrap a text table as fake binary assets (UTF-8 payloads) — used by
    * tests and the oracle query so the binary plumbing runs on real rows
    * without synthesizing data.
    */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast(LongType).as("asset_id"),
      lit("image").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("documents").as("source"), lit("application/octet-stream").as("mime"),
        octet_length(col(textCol)).cast(LongType).as("n_bytes")).as("meta"))

  /** Frame/sample selection for video/audio-like payloads: pick every
    * `stride`-th byte offset as a "frame" — the partitioning and explode
    * shape of real frame sampling, with the codec stubbed.
    */
  def frameSample(assets: DataFrame, stride: Int): DataFrame =
    assets.select(col("asset_id"),
      posexplode(sequence(lit(0), greatest(col("meta.n_bytes").cast("int") - 1, lit(0)),
        lit(stride))).as(Seq("frame_idx", "byte_offset")))

  final case class ResizedMeta(asset_id: Long, width: Int, height: Int,
                               payload: Array[Byte])

  /** STUB resize: streams per-partition batches through the "codec" and
    * re-emits payloads with target dimensions. The real implementation
    * swaps the body for an image library; the iterator shape (no partition
    * materialization, executor-parallel) is the production contract.
    */
  def resizeStub(df: DataFrame, w: Int, h: Int): Dataset[ResizedMeta] = {
    implicit val enc = Encoders.product[ResizedMeta]
    df.select(col("asset_id"), col("payload")).mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.isNullAt(1)) Array.emptyByteArray
                    else row.getAs[Array[Byte]](1)
        // deterministic fake: truncate/pad payload to w*h/64 bytes
        val target = math.max(w * h / 64, 1)
        val out = java.util.Arrays.copyOf(bytes, target)
        ResizedMeta(row.getLong(0), w, h, out)
      }
    }
  }

  final case class ExtractedFeatures(asset_id: Long, embedding: Array[Float])

  /** STUB feature extraction: deterministic fake embedding derived from the
    * payload bytes (rolling byte sums per dimension, L2-normalized) — the
    * schema (`array<float>`) and batch shape feed directly into the Ann
    * operators, so the multimodal → similarity-search pipeline runs
    * end-to-end without the real encoder.
    */
  def extractFeaturesStub(df: DataFrame, dim: Int): Dataset[ExtractedFeatures] = {
    implicit val enc = Encoders.product[ExtractedFeatures]
    df.select(col("asset_id"), col("payload")).mapPartitions { it =>
      it.map { row =>
        val bytes = if (row.isNullAt(1)) Array.emptyByteArray
                    else row.getAs[Array[Byte]](1)
        val acc = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) {
          acc(i % dim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        val norm = math.sqrt(acc.map(x => x * x).sum).toFloat
        val emb = if (norm > 0) acc.map(_ / norm) else acc
        ExtractedFeatures(row.getLong(0), emb)
      }
    }
  }
}
