package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing for training-data pipelines: media assets
 * are opaque `binary` columns with typed metadata, processed by
 * batch-shaped partition functions.
 *
 * Scale design: the decode/feature step is the Scala analogue of a
 * Pandas-UDF-over-mapInPandas pipeline — a `Dataset[T].mapPartitions`
 * whose function sees an ITERATOR of rows per partition (the batch
 * shape), so a real decoder could amortize library/model setup once
 * per partition and stream through without materializing. Binary
 * payloads never shuffle: decode is a narrow map, frame sampling is a
 * generator (posexplode) applied before any wide op, and metadata-only
 * transforms (resize) never touch the bytes.
 *
 * The byte-level decode itself is a STUB — image/audio/video codec
 * libraries are not available in this environment. `MediaCodec`
 * derives deterministic fake metadata from header bytes; swap its body
 * for real codec calls (e.g. javax.imageio / ffmpeg bindings) without
 * touching any of the surrounding plumbing, schema, or tests.
 */
object Multimodal {

  /** Raw asset: opaque payload + routing metadata. */
  final case class RawAsset(asset_id: Long, kind: String, content: Array[Byte])

  /** Decoded metadata (width/height for visual kinds, n_frames for
    * video, sample_rate for audio, avg_byte as a cheap content stat). */
  final case class DecodedAsset(asset_id: Long, kind: String,
      width: Int, height: Int, n_frames: Int, sample_rate: Int,
      avg_byte: Double)

  /**
   * STUB batch decoder — deterministic fake metadata from header
   * bytes. Signature and batch shape (Iterator → Iterator per
   * partition) are the real contract; only the body is fake.
   */
  object MediaCodec {
    def decodeBatch(assets: Iterator[RawAsset]): Iterator[DecodedAsset] = {
      // Real implementation would initialize the codec library HERE,
      // once per partition, before streaming the batch through it.
      // Null or zero-byte payloads are UNDECODABLE by definition (a
      // real codec throws on them too) and are dropped — the same
      // skip-don't-crash contract a production decode stage needs for
      // a feed whose upstream occasionally delivers empty blobs.
      // Header probes past the payload's end read 0, so a truncated
      // asset decodes to degenerate metadata instead of an
      // out-of-bounds crash.
      assets.filter(a => a.content != null && a.content.nonEmpty)
        .map(decodeOne)
    }

    /** One asset through the stub codec (callers hold the non-empty
      * filter — the shared skip contract). */
    private[multimodal] def decodeOne(a: RawAsset): DecodedAsset = {
      def b(i: Int): Int =
        if (i < a.content.length) a.content(i) & 0xFF else 0
      val avg = a.content.foldLeft(0L)((s, x) => s + (x & 0xFF)).toDouble / a.content.length
      a.kind match {
        case "image" => DecodedAsset(a.asset_id, a.kind,
          16 + b(0) % 240, 16 + b(1) % 240, 1, 0, avg)
        case "audio" => DecodedAsset(a.asset_id, a.kind,
          0, 0, 0, 8000 + 100 * (b(2) % 80), avg)
        case _ => DecodedAsset(a.asset_id, a.kind, // video
          16 + b(0) % 240, 16 + b(1) % 240, 1 + b(3) % 120, 0, avg)
      }
    }
  }

  /** Per-asset feature vector (stub): payload bytes scaled to [0,1]
    * doubles. Real pipelines put the model-encoder call here, with the
    * same batch shape as decode. */
  final case class AssetFeatures(asset_id: Long, features: Array[Double])

  def extractFeatures(raw: Dataset[RawAsset], dims: Int): Dataset[AssetFeatures] = {
    import raw.sparkSession.implicits._
    // same skip contract as the codec — null AND zero-byte payloads
    // produce no feature row (a real encoder has nothing to embed,
    // and an empty features array would crash ANSI element_at
    // downstream); keeps decode/features membership identical
    raw.mapPartitions(_.filter(a =>
      a.content != null && a.content.nonEmpty).map { a =>
      AssetFeatures(a.asset_id,
        Array.tabulate(math.min(dims, a.content.length))(i =>
          (a.content(i) & 0xFF).toDouble / 255))
    })
  }

  /** Decode a raw-asset Dataset via the batch codec (narrow pass). */
  def decode(raw: Dataset[RawAsset]): Dataset[DecodedAsset] = {
    import raw.sparkSession.implicits._
    raw.mapPartitions(MediaCodec.decodeBatch)
  }

  /** Decoded metadata WITH the payload riding along. */
  final case class DecodedAssetContent(asset_id: Long, kind: String,
      width: Int, height: Int, n_frames: Int, sample_rate: Int,
      avg_byte: Double, content: Array[Byte])

  /** [[decode]] keeping the payload column — the frame-sampling feed:
    * a consumer that needs both the decoded metadata AND the bytes
    * must not decode-then-REJOIN the payload by asset id (that join
    * shuffles every payload a second time at corpus scale — the
    * decide-small/move-once rule); the decoder is the one place the
    * bytes are read, so the bytes ride its output. Same skip contract
    * and same per-asset metadata as [[decode]] (shared decodeOne). */
  def decodeWithContent(raw: Dataset[RawAsset]): Dataset[DecodedAssetContent] = {
    import raw.sparkSession.implicits._
    raw.mapPartitions(_.filter(a => a.content != null && a.content.nonEmpty)
      .map { a =>
        val d = MediaCodec.decodeOne(a)
        DecodedAssetContent(d.asset_id, d.kind, d.width, d.height,
          d.n_frames, d.sample_rate, d.avg_byte, a.content)
      })
  }

  /**
   * Metadata-only resize to fit a square of `target` px, preserving
   * aspect ratio with exact integer arithmetic; audio rows pass
   * through. Never touches payload bytes.
   */
  def resizeMeta(decoded: DataFrame, target: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def fit(c: String) =
      when(col("kind") === "audio", col(c))
        .otherwise(greatest(lit(1), expr(s"($c * $target) div greatest(width, height)")))
    decoded
      .withColumn("out_width", fit("width").cast("int"))
      .withColumn("out_height", fit("height").cast("int"))
      .withColumn("scaled", (longSide > target && col("kind") =!= "audio").cast("int"))
  }

  /**
   * Evenly sample up to `maxFrames` frame indices per video asset:
   * frame_no_j = floor(j·n_frames / maxFrames), deduplicated. The
   * frame "payload" key is a deterministic stub (md5 of hex(content)
   * + index) standing in for the real frame-extraction call.
   */
  def sampleFrames(withContent: DataFrame, maxFrames: Int): DataFrame = {
    val idxs = array_distinct(
      transform(sequence(lit(0), lit(maxFrames - 1)),
        j => floor((j * col("n_frames")).cast("double") / maxFrames).cast("int")))
    withContent
      .filter(col("kind") === "video")
      .select(col("asset_id"), col("content"), explode(idxs).as("frame_no"))
      .withColumn("frame_key",
        md5(concat(hex(col("content")), lit(":"), col("frame_no").cast("string"))))
      .select(col("asset_id"), col("frame_no"), col("frame_key"))
  }
}
