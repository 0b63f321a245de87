package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * Three implementation tiers:
  *  - [[withPngHeaderMeta]]: REAL zero-dependency header decode as pure
  *    columns — PNG IHDR width/height are fixed-offset big-endian ints,
  *    readable with `substring`/`hex`/`conv` and so codegen'd and
  *    exactly oracle-checkable (q89).
  *  - [[decodeHeaders]]: `mapPartitions` over a typed Dataset — the
  *    Scala analogue of `mapInPandas` (per-partition batch processing)
  *    for formats needing an imperative walk: the JPEG SOF marker scan
  *    lives here, next to where a real codec would.
  *  - [[decodePixels]]: REAL raster decode via the JDK's own ImageIO
  *    codecs (PNG/JPEG/GIF/BMP) — full pixel access, statistics
  *    derived executor-side so pixel buffers never enter the plan.
  *  - [[decodeStub]]: deterministic fake for the one stage that
  *    genuinely needs an external codec library (video frames) — swap
  *    its body for e.g. JCodec without touching the plan.
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

  // -----------------------------------------------------------------
  // Real header decode (zero dependencies)
  // -----------------------------------------------------------------

  /** Big-endian uint32 read at 1-indexed byte `pos` of a binary column
    * — `substring` works on binary, `hex`+`conv` do the int parse, all
    * codegen'd built-ins. */
  private def be32(payload: Column, pos: Int): Column =
    conv(hex(substring(payload, pos, 4)), 16, 10).cast("long")

  /** True when the payload starts with the 8-byte PNG signature and
    * its first chunk is IHDR (always the case for a valid PNG). */
  def isPng(payload: Column): Column =
    length(payload) >= 24 &&
      upper(hex(substring(payload, 1, 8))) === "89504E470D0A1A0A" &&
      upper(hex(substring(payload, 13, 4))) === "49484452"

  /** REAL PNG dimension decode as pure columns: IHDR width/height are
    * the big-endian uint32s at bytes 17-20 / 21-24 of the file (PNG
    * spec: 8-byte signature, 4-byte chunk length, "IHDR", then the
    * fields). NULL for non-PNG payloads — route those to
    * [[decodeHeaders]] (JPEG) or [[decodeStub]] (codec formats). */
  def withPngHeaderMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    media
      .withColumn("byte_len", length(p).cast("long"))
      .withColumn("width", when(isPng(p), be32(p, 17)).cast("int"))
      .withColumn("height", when(isPng(p), be32(p, 21)).cast("int"))
  }

  /** Construct a valid PNG header (signature + IHDR chunk, 8-bit RGB)
    * for given dimensions — the round-trip twin of
    * [[withPngHeaderMeta]], used to prove the parse against real bytes
    * with an independent oracle (q89). CRC is zeroed: readers that
    * verify it would reject the chunk, but the fixed-offset fields this
    * module reads are real. */
  def pngHeaderPayload(width: Column, height: Column): Column = {
    // consumed guard (raise_error INSIDE the emitted expression — a
    // detached assert column would be optimizer-pruned): hex() of a
    // negative long is 16 digits and >= 2^32 overflows 8, either of
    // which lpad would silently truncate into a corrupt header. PNG
    // dimensions are uint31 per the spec.
    def be32Dim(name: String, dim: Column): Column = {
      val d = dim.cast("long")
      unhex(lpad(hex(when(d.between(1, 0x7FFFFFFFL), d)
        .otherwise(raise_error(format_string(
          s"pngHeaderPayload: $name out of PNG uint31 range [1, 2^31-1]: %s",
          d)))), 8, "0"))
    }
    concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")),         // IHDR length = 13
      unhex(lit("49484452")),         // "IHDR"
      be32Dim("width", width),
      be32Dim("height", height),
      unhex(lit("0806000000")),       // bit depth 8, RGBA, default methods
      unhex(lit("00000000")))         // CRC (unverified placeholder)
  }

  /** Little-endian uint read of `len` bytes at 1-indexed `pos` — WAV
    * (RIFF) headers are little-endian, so the hex pairs reassemble in
    * reverse byte order before the int parse. Still pure built-ins. */
  private def leN(payload: Column, pos: Int, len: Int): Column =
    conv(concat((0 until len).reverse.map(i =>
      hex(substring(payload, pos + i, 1))): _*), 16, 10).cast("long")

  /** True for a canonical PCM WAV: RIFF signature, WAVE form type,
    * "fmt " as the first chunk (the canonical layout every encoder
    * writes; non-canonical chunk orders route to [[decodeHeaders]]-
    * style walks). */
  def isWav(payload: Column): Column =
    length(payload) >= 36 &&
      upper(hex(substring(payload, 1, 4))) === "52494646" && // "RIFF"
      upper(hex(substring(payload, 9, 8))) === "57415645666D7420" // "WAVEfmt "

  /** REAL WAV (canonical PCM) header decode as pure columns: channels,
    * sample rate, and bits per sample are fixed-offset little-endian
    * ints in the fmt chunk (bytes 23-24, 25-28, 35-36 of the file).
    * NULL for non-WAV payloads — the audio twin of
    * [[withPngHeaderMeta]]. */
  def withWavHeaderMeta(media: DataFrame): DataFrame = {
    val p = col("payload")
    media
      .withColumn("byte_len", length(p).cast("long"))
      .withColumn("channels", when(isWav(p), leN(p, 23, 2)).cast("int"))
      .withColumn("sample_rate", when(isWav(p), leN(p, 25, 4)).cast("int"))
      .withColumn("bits_per_sample", when(isWav(p), leN(p, 35, 2)).cast("int"))
  }

  /** Construct a canonical PCM WAV header for the given format — the
    * round-trip twin of [[withWavHeaderMeta]] (q100), analogous to
    * [[pngHeaderPayload]]. Sizes are zeroed: readers that stream the
    * data chunk would stop immediately; the fixed-offset fmt fields
    * this module reads are real. */
  def wavHeaderPayload(channels: Column, sampleRate: Column,
      bitsPerSample: Column): Column = {
    def le(c: Column, len: Int): Column =
      unhex(concat((0 until len).map { i =>
        lpad(hex(shiftrightunsigned(c.cast("long"), 8 * i) % 256), 2, "0")
      }: _*))
    val byteRate = sampleRate.cast("long") * channels * (bitsPerSample / 8)
    val blockAlign = channels.cast("long") * (bitsPerSample / 8)
    concat(
      unhex(lit("52494646")), unhex(lit("00000000")),   // "RIFF" + size 0
      unhex(lit("57415645666D7420")),                   // "WAVEfmt "
      unhex(lit("10000000")),                           // fmt chunk len 16
      unhex(lit("0100")),                               // PCM
      le(channels, 2), le(sampleRate, 4),
      le(byteRate, 4), le(blockAlign, 2), le(bitsPerSample, 2))
  }

  /** PNG IHDR parse over raw bytes (driver/executor-side twin of
    * [[withPngHeaderMeta]] for the mapPartitions tier). */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u(i: Int): Int = b(i) & 0xff
    def be(o: Int): Int = (u(o) << 24) | (u(o + 1) << 16) | (u(o + 2) << 8) | u(o + 3)
    if (b.length >= 24 &&
        u(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be(16), be(20)))
    else None
  }

  /** JPEG dimension decode: walk the marker stream to the first SOFn
    * segment (the frame header carrying height/width). Imperative by
    * nature — variable-length segments — so it lives in the
    * mapPartitions tier, not expressions. Returns None on truncated or
    * non-JPEG bytes. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    def u(i: Int): Int = b(i) & 0xff
    if (b.length < 4 || u(0) != 0xff || u(1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u(i) != 0xff) return None // desynced: not a marker
      val marker = u(i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length field
      } else {
        val len = (u(i + 2) << 8) | u(i + 3)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc // not DHT/JPG/DAC
        if (isSof) {
          if (i + 8 >= b.length) return None
          val h = (u(i + 5) << 8) | u(i + 6)
          val w = (u(i + 7) << 8) | u(i + 8)
          return Some((w, h))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Deterministic PNG fixture: gray gradient `pixel(x,y) = (seed +
    * 7x + 13y) % 256` across all three channels, encoded by the JDK's
    * own PNG writer. PNG is lossless, so every pixel statistic of the
    * DECODED image is an integer formula of (width, height, seed) — an
    * oracle can predict [[decodePixels]]' output without ever seeing
    * the bytes (q103). */
  def generatePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = ((seed + 7L * x + 13L * y) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // same rationale as decodePixels: ImageIO's default stream cache is
    // a temp FILE per write — an in-memory encode must not pay disk I/O
    // (the flag is JVM-global but idempotent)
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One decoded pixel row: header dims (the zero-dependency parse)
    * alongside the REAL decoded raster's dims and channel sum — the
    * two width sources cross-check each other (q103). `rgb_sum` is the
    * exact integer Σ(r+g+b) over every pixel; `None` pixel fields mean
    * ImageIO has no codec for the container (route to [[decodeStub]]). */
  final case class PixelMeta(doc_id: Long, media_type: String,
      container: String, width: Option[Int], height: Option[Int],
      px_width: Option[Int], px_height: Option[Int], rgb_sum: Option[Long])

  /** REAL pixel decode via JDK ImageIO (PNG/JPEG/GIF/BMP — the codecs
    * the JDK ships), mapPartitions tier: decodes the full raster and
    * derives integer channel statistics executor-side, so only the
    * derived columns — never pixel buffers — enter the plan. The
    * header parse rides along for the dims cross-check. Containers
    * ImageIO can't read (video) return null pixel fields; THAT decode
    * is [[decodeStub]]'s remaining scope. */
  def decodePixels(spark: SparkSession, media: DataFrame): Dataset[PixelMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init, where a heavier codec would be instantiated
      // once: ImageIO's default stream cache is a TEMP FILE per read —
      // in-memory payloads must not pay a disk round-trip per image
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val b = if (r.payload == null) Array.empty[Byte] else r.payload
        val asPng = pngDims(b)
        val hdr = asPng.orElse(jpegDims(b))
        val container =
          if (asPng.isDefined) "png"
          else if (hdr.isDefined) "jpeg"
          else "unknown"
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
          // NonFatal, not just IOException: JDK codecs throw
          // ArrayIndexOutOfBounds/IllegalArgument on some malformed
          // payloads, and the contract is null pixel fields — not a
          // dead task — for anything undecodable
          catch { case scala.util.control.NonFatal(_) => None }
        val sum = img.map { i =>
          var s = 0L
          var y = 0
          while (y < i.getHeight) {
            var x = 0
            while (x < i.getWidth) {
              val rgb = i.getRGB(x, y)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          s
        }
        PixelMeta(r.doc_id, r.media_type, container,
          hdr.map(_._1), hdr.map(_._2),
          img.map(_.getWidth), img.map(_.getHeight), sum)
      }
    }
  }

  /** One decoded header row: real dims where a zero-dependency parse
    * exists (PNG, JPEG), null dims otherwise (route to a codec). */
  final case class HeaderMeta(doc_id: Long, media_type: String,
      byte_len: Long, container: String, width: Option[Int], height: Option[Int])

  /** REAL header decode, mapPartitions tier: PNG IHDR + JPEG SOF walk
    * over the payload bytes — no codec library, no fake. Formats
    * without a header-only parse (video, audio) come back with null
    * dims; their pixel/sample decode belongs in [[decodeStub]]'s
    * per-partition loop with a real codec. */
  def decodeHeaders(spark: SparkSession, media: DataFrame): Dataset[HeaderMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val b = if (r.payload == null) Array.empty[Byte] else r.payload
        val asPng = pngDims(b)
        val dims = asPng.orElse(jpegDims(b))
        val container =
          if (asPng.isDefined) "png"
          else if (dims.isDefined) "jpeg"
          else "unknown"
        HeaderMeta(r.doc_id, r.media_type, b.length.toLong, container,
          dims.map(_._1), dims.map(_._2))
      }
    }
  }

  /** Expression-level fake decode: metadata derived deterministically
    * from the payload hash (md5 hex prefix → dimensions). Kept ONLY as
    * the stand-in for codec-requiring formats in fixtures that carry no
    * real header; PNG/JPEG go through [[withPngHeaderMeta]] /
    * [[decodeHeaders]] instead. */
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
    * payload bytes into an 8-dim feature from byte statistics. This is
    * the one remaining fake, and its scope is now VIDEO frames only —
    * a codec absent from both the JDK and this container; header
    * metadata is real ([[withPngHeaderMeta]]/[[decodeHeaders]]) and
    * image pixel decode is real ([[decodePixels]], JDK ImageIO). A
    * real implementation would decode the codec here — per partition,
    * so decoder instances are reused across the batch, mirroring
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

  /** One resized-image row: source dims, target dims, and the exact
    * integer channel sum of the RESAMPLED raster. Null pixel fields =
    * ImageIO couldn't decode the container. */
  final case class ResizedMeta(doc_id: Long, media_type: String,
      src_w: Option[Int], src_h: Option[Int], dst_w: Int, dst_h: Int,
      rgb_sum: Option[Long])

  /** REAL image resize (mapPartitions tier): decode via ImageIO, then
    * NEAREST-NEIGHBOR resample with explicit integer index math —
    * src(x,y) = (x*srcW div dstW, y*srcH div dstH). NN by hand rather
    * than Graphics2D scaling because the sampling grid is then exactly
    * reproducible (an analytic oracle can predict every output pixel);
    * production thumbnailing could swap in area-averaging here without
    * touching the plan shape. Only derived columns leave the executor
    * — pixel buffers never enter the plan, same contract as
    * [[decodePixels]]. */
  def resizePixels(spark: SparkSession, media: DataFrame,
      dstW: Int, dstH: Int): Dataset[ResizedMeta] = {
    require(dstW > 0 && dstH > 0, s"target dims must be positive, got ${dstW}x$dstH")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val b = if (r.payload == null) Array.empty[Byte] else r.payload
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
          catch { case scala.util.control.NonFatal(_) => None }
        val sum = img.map { i =>
          var s = 0L
          var y = 0
          while (y < dstH) {
            val sy = y * i.getHeight / dstH
            var x = 0
            while (x < dstW) {
              val sx = x * i.getWidth / dstW
              val rgb = i.getRGB(sx, sy)
              s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          s
        }
        ResizedMeta(r.doc_id, r.media_type,
          img.map(_.getWidth), img.map(_.getHeight), dstW, dstH, sum)
      }
    }
  }

  /** Canonical 44-byte-header PCM WAV (8-bit mono 8 kHz) whose sample
    * stream is the deterministic walk s(i) = (seed + 11*i) mod 256 —
    * the audio twin of [[generatePng]]'s gray gradient: a REAL payload
    * an analytic oracle can predict without seeing a byte. */
  def generateWavPcm(nSamples: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](44 + nSamples)
    def ascii(pos: Int, s: String): Unit =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(out, pos)
    def le(pos: Int, v: Long, len: Int): Unit = {
      var i = 0
      while (i < len) { out(pos + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    ascii(0, "RIFF"); le(4, 36L + nSamples, 4); ascii(8, "WAVE")
    ascii(12, "fmt "); le(16, 16, 4); le(20, 1, 2); le(22, 1, 2)
    le(24, 8000, 4); le(28, 8000, 4); le(32, 1, 2); le(34, 8, 2)
    ascii(36, "data"); le(40, nSamples.toLong, 4)
    var i = 0
    while (i < nSamples) {
      out(44 + i) = (((seed + 11L * i) % 256 + 256) % 256).toByte
      i += 1
    }
    out
  }

  /** One frame-sampled audio row: total PCM samples in the payload,
    * how many the stride kept, and their exact integer sum. Null
    * fields = not a canonical PCM WAV payload. */
  final case class FrameSampleMeta(doc_id: Long, media_type: String,
      n_samples: Option[Int], n_sampled: Option[Int], sample_sum: Option[Long])

  /** REAL byte-level frame sampling (mapPartitions tier): walk the
    * 8-bit PCM data chunk of a canonical WAV payload keeping every
    * `stride`-th sample — the audio analogue of video frame-striding,
    * against real bytes (video itself stays [[decodeStub]]'s scope:
    * no codec in the JDK). Fixed-offset parse guarded by the RIFF/
    * WAVE/data magics; anything else yields nulls, not a dead task. */
  def samplePcmFrames(spark: SparkSession, media: DataFrame,
      stride: Int): Dataset[FrameSampleMeta] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val b = if (r.payload == null) Array.empty[Byte] else r.payload
        def magic(pos: Int, s: String): Boolean =
          b.length >= pos + s.length &&
            s.indices.forall(i => b(pos + i) == s.charAt(i).toByte)
        if (magic(0, "RIFF") && magic(8, "WAVE") && magic(36, "data") &&
            b.length >= 44) {
          val n = math.min(
            (b(40) & 0xff) | ((b(41) & 0xff) << 8) |
              ((b(42) & 0xff) << 16) | ((b(43) & 0xff) << 24),
            b.length - 44)
          var s = 0L
          var k = 0
          var i = 0
          while (i < n) { s += (b(44 + i) & 0xff); k += 1; i += stride }
          FrameSampleMeta(r.doc_id, r.media_type, Some(n), Some(k), Some(s))
        } else FrameSampleMeta(r.doc_id, r.media_type, None, None, None)
      }
    }
  }
}
