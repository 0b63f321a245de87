package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning, the
  * `binaryFile` source mapping) is real and tested; the actual codec
  * step is STUBBED with a deterministic fake because no image/audio
  * libraries exist in this container — swap [[decodeStub]]'s body for a
  * real decoder (e.g. TwelveMonkeys/JCodec) without touching the plan.
  *
  * Two implementation tiers:
  *  - [[withFakeDecodeMeta]]: pure-expression metadata derivation —
  *    stays in WholeStageCodegen, has an exact DuckDB oracle.
  *  - [[decodeStub]]: `mapPartitions` over a typed Dataset — the Scala
  *    analogue of `mapInPandas` (per-partition batch processing), for
  *    when the decode genuinely needs library calls. Partition-sized
  *    batches keep codec state/buffer reuse per task.
  */
object Multimodal {

  /** One media row: opaque payload + source metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata + a fixed-width feature vector. */
  final case class DecodedMedia(
      doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Wrap any DataFrame with a string column into media rows (payload =
    * UTF-8 bytes). In production the payload comes from
    * `spark.read.format("binaryFile")` — same schema. */
  def asMedia(df: DataFrame, idCol: String, contentCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit(mediaType).as("media_type"),
      col(contentCol).cast("binary").as("payload"))

  /** The real on-disk path of the §7.5 mapping: Spark's `binaryFile`
    * source over a media directory → (path, byte_len, payload). The
    * source carries file metadata in the SCAN (path/length/modTime),
    * so a `length < N` or path filter prunes before content bytes are
    * read; at 100 TB keep payloads out of shuffles — derive features
    * map-side ([[withFakeDecodeMeta]]/[[decodeStub]] tiers), move only
    * the derived columns. */
  def readBinaryFiles(spark: SparkSession, root: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(col("path"), col("length").as("byte_len"),
        col("content").as("payload"))

  /** Magic-byte container sniffing over the payload prefix — the
    * metadata tier that needs no codec library. */
  def sniffMagic(payload: Column): Column =
    when(upper(hex(substring(payload, 1, 2))) === "1F8B", "gzip")
      .when(upper(hex(substring(payload, 1, 4))) === "89504E47", "png")
      .when(upper(hex(substring(payload, 1, 2))) === "FFD8", "jpeg")
      .when(upper(hex(substring(payload, 1, 4))) === "52494646", "riff")
      .otherwise("unknown")

  /** Expression-level fake decode: metadata derived deterministically
    * from the payload hash (md5 hex prefix → dimensions). Replaces a
    * real header parse; the derivation is frozen so it oracle-checks. */
  def withFakeDecodeMeta(media: DataFrame): DataFrame = {
    val h = md5(col("payload"))
    media
      .withColumn("byte_len", length(col("payload")).cast("long"))
      .withColumn("width",
        (lit(16) + conv(substring(h, 1, 2), 16, 10).cast("long") % 64).cast("int"))
      .withColumn("height",
        (lit(16) + conv(substring(h, 3, 2), 16, 10).cast("long") % 64).cast("int"))
      .withColumn("n_frames",
        (lit(1) + conv(substring(h, 5, 2), 16, 10).cast("long") % 8).cast("int"))
  }

  /** STUB decode (mapPartitions tier). Deterministic fake: "decodes"
    * payload bytes into an 8-dim feature from byte statistics. A real
    * implementation would decode the codec here — per partition, so
    * decoder instances are reused across the batch, mirroring
    * `mapInPandas` batch semantics. */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real decoder would be instantiated ONCE here, per partition
      rows.map { r =>
        val bytes = if (r.payload == null) Array.empty[Byte] else r.payload
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(bytes)
        def u(i: Int): Int = h(i) & 0xff
        val feature = Array.tabulate(8) { i =>
          // fake "embedding": mean of every 8th byte, offset i
          val sel = bytes.indices.filter(_ % 8 == i).map(j => (bytes(j) & 0xff).toFloat)
          if (sel.isEmpty) 0f else sel.sum / sel.length
        }
        DecodedMedia(
          r.doc_id, r.media_type, bytes.length.toLong,
          16 + u(0) % 64,
          16 + u(1) % 64,
          1 + u(2) % 8,
          feature)
      }
    }
  }

  /** Resize planning: aspect-preserving target dimensions fitting a
    * (maxW, maxH) box, never upscaling — pure integer expressions
    * (cross-multiplied comparison picks the binding side, integer
    * division floors), so the plan stays in codegen and is exactly
    * reproducible. The pixel resample consuming these dims belongs in
    * [[decodeStub]]'s per-partition loop with the codec. */
  def withResizeDims(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val (w, h) = (col("width").cast("long"), col("height").cast("long"))
    val fitsAlready = w <= maxW && h <= maxH
    val widthBinds = w * maxH >= h * maxW // maxW/w <= maxH/h without division
    decoded
      .withColumn("out_width",
        when(fitsAlready, w)
          .when(widthBinds, lit(maxW.toLong))
          .otherwise(greatest(expr(s"width * ${maxH}L div height"), lit(1L)))
          .cast("int"))
      .withColumn("out_height",
        when(fitsAlready, h)
          .when(widthBinds, greatest(expr(s"height * ${maxW}L div width"), lit(1L)))
          .otherwise(lit(maxH.toLong))
          .cast("int"))
  }

  /** Frame sampling for video-like payloads: keep every `stride`-th
    * frame index up to `maxFrames` — pure plan (posexplode over a
    * sequence), the decode of each sampled frame happens downstream. */
  def sampleFrames(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded.select(
      col("doc_id"),
      explode(sequence(lit(0), least(col("n_frames") - 1, lit(maxFrames * stride - 1)), lit(stride)))
        .as("frame_idx"))
}
