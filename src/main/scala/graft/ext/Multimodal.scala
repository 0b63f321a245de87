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
  *  - [[decodeVideoHeaders]]: REAL MP4 box walk / AVI RIFF chunk walk
  *    for video container metadata. Frame PIXEL decode is the one
  *    stage that genuinely needs an external codec library (absent
  *    from the JDK) — it plugs into these mapPartitions bodies
  *    without touching the plan.
  */
object Multimodal {

  /** One media row: opaque payload + source metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

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
    * map-side ([[decodeHeaders]]/[[decodePixels]] tiers), move only
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
    * [[decodeHeaders]] (JPEG) or [[decodeVideoHeaders]] (MP4/AVI). */
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
    * ImageIO has no codec for the container (route video to
    * [[decodeVideoHeaders]] for metadata). */
  final case class PixelMeta(doc_id: Long, media_type: String,
      container: String, width: Option[Int], height: Option[Int],
      px_width: Option[Int], px_height: Option[Int], rgb_sum: Option[Long])

  /** REAL pixel decode via JDK ImageIO (PNG/JPEG/GIF/BMP — the codecs
    * the JDK ships), mapPartitions tier: decodes the full raster and
    * derives integer channel statistics executor-side, so only the
    * derived columns — never pixel buffers — enter the plan. The
    * header parse rides along for the dims cross-check. Containers
    * ImageIO can't read (video) return null pixel fields; their header
    * metadata comes from [[decodeVideoHeaders]], and frame pixels need
    * an external codec. */
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
    * this walk doesn't cover come back with null dims — video headers
    * have their own walk ([[decodeVideoHeaders]]), WAV its fmt parse
    * ([[withWavHeaderMeta]]). */
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

  // ------------------------------------------------------------------
  // Video containers: REAL zero-dependency header decode. MP4 and AVI
  // carry dimensions/duration in plain header structures (ISO BMFF
  // boxes; RIFF chunks) that need no codec to read — the same contract
  // as the PNG IHDR and WAV fmt parses. Frame PIXEL decode would need
  // an external codec (JCodec etc.) and plugs into a mapPartitions
  // body exactly like [[decodePixels]]'s ImageIO loop.
  // ------------------------------------------------------------------

  /** Canonical minimal ISO-BMFF MP4: `ftyp` + `moov(mvhd, trak(tkhd))`,
    * all version-0 boxes, big-endian. mvhd timescale is fixed at 1000
    * so duration units ARE milliseconds; tkhd carries width/height as
    * 16.16 fixed-point — a REAL payload whose fields an analytic
    * oracle predicts without seeing a byte (the [[generateWavPcm]]
    * pattern applied to video). */
  def generateMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    def be(v: Long, len: Int): Array[Byte] =
      Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)
    def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(payload.length + 8L, 4) ++ ascii(typ) ++ payload
    val ftyp = box("ftyp", ascii("isom") ++ be(0, 4))
    val mvhd = box("mvhd",
      be(0, 4) ++                     // version 0 + flags
      be(0, 4) ++ be(0, 4) ++         // creation, modification
      be(1000, 4) ++                  // timescale: 1000 ticks/sec
      be(durationMs, 4) ++            // duration (= ms at this timescale)
      be(0x00010000L, 4) ++ be(0, 2) ++ be(0, 10) ++ // rate, volume, reserved
      (be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++
        be(0, 4) ++ be(0x00010000L, 4) ++ be(0, 4) ++
        be(0, 4) ++ be(0, 4) ++ be(0x40000000L, 4)) ++ // identity matrix
      be(0, 24) ++                    // pre_defined
      be(2, 4))                       // next_track_ID
    val tkhd = box("tkhd",
      be(7, 4) ++                     // version 0 + flags (enabled)
      be(0, 4) ++ be(0, 4) ++         // creation, modification
      be(1, 4) ++ be(0, 4) ++         // track_ID, reserved
      be(durationMs, 4) ++ be(0, 8) ++ // duration, reserved
      be(0, 2) ++ be(0, 2) ++ be(0, 2) ++ be(0, 2) ++ // layer/group/volume/rsvd
      (be(0x00010000L, 4) ++ be(0, 4) ++ be(0, 4) ++
        be(0, 4) ++ be(0x00010000L, 4) ++ be(0, 4) ++
        be(0, 4) ++ be(0, 4) ++ be(0x40000000L, 4)) ++
      be(width.toLong << 16, 4) ++    // 16.16 fixed-point
      be(height.toLong << 16, 4))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Canonical minimal AVI: `RIFF('AVI ', LIST('hdrl', avih))`,
    * little-endian RIFF chunks. The avih main header carries
    * microseconds-per-frame, total frames, width, height at fixed
    * payload offsets (0/16/32/36) — the video twin of the WAV fmt
    * chunk. */
  def generateAvi(width: Int, height: Int, nFrames: Int,
      usecPerFrame: Int): Array[Byte] = {
    def le(v: Long, len: Int): Array[Byte] =
      Array.tabulate(len)(i => ((v >> (8 * i)) & 0xff).toByte)
    def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val avih = le(usecPerFrame, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++
      le(nFrames, 4) ++ le(0, 4) ++ le(1, 4) ++ le(0, 4) ++
      le(width, 4) ++ le(height, 4) ++ le(0, 16)
    val avihChunk = ascii("avih") ++ le(avih.length, 4) ++ avih
    val hdrl = ascii("LIST") ++ le(4L + avihChunk.length, 4) ++
      ascii("hdrl") ++ avihChunk
    ascii("RIFF") ++ le(4L + hdrl.length, 4) ++ ascii("AVI ") ++ hdrl
  }

  /** One decoded video-header row. MP4: duration from mvhd
    * (duration * 1000 / timescale), frame count not in the header
    * (lives in stts sample tables) → null. AVI: frame count is the
    * avih field, duration derived = frames * usecPerFrame / 1000.
    * Null everything = not a recognized container. */
  final case class VideoMeta(doc_id: Long, media_type: String,
      container: Option[String], width: Option[Int], height: Option[Int],
      duration_ms: Option[Long], n_frames: Option[Int])

  /** REAL video container header decode (mapPartitions tier): an ISO
    * BMFF box walk (ftyp/moov/mvhd/trak/tkhd, big-endian) and a RIFF
    * chunk walk (LIST/hdrl/avih, little-endian) over the payload
    * bytes — no codec library, no fake; the walk follows box sizes,
    * not hardcoded file offsets, so real-world files with extra boxes
    * parse too. Frame pixel decode (needs a codec the JDK lacks)
    * would slot into this per-partition loop like [[decodePixels]]'s
    * ImageIO body. */
  def decodeVideoHeaders(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val b = if (r.payload == null) Array.empty[Byte] else r.payload
        def be32(p: Int): Long =
          ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
            ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
        def le32(p: Int): Long =
          (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
            ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
        def fourcc(p: Int): String =
          if (b.length < p + 4) ""
          else new String(b.slice(p, p + 4), java.nio.charset.StandardCharsets.US_ASCII)

        def mp4Meta(): Option[VideoMeta] = {
          if (b.length < 12 || fourcc(4) != "ftyp") return None
          var w, h = Option.empty[Int]
          var dur = Option.empty[Long]
          def walk(from: Int, to: Int, depth: Int): Unit = {
            var p = from
            while (p + 8 <= to) {
              val size = be32(p)
              val typ = fourcc(p + 4)
              if (size < 8 || p + size > to) return
              typ match {
                case "moov" | "trak" if depth < 4 =>
                  walk(p + 8, p + size.toInt, depth + 1)
                case "mvhd" if size >= 28 =>
                  val timescale = be32(p + 8 + 12)
                  if (timescale > 0)
                    dur = Some(be32(p + 8 + 16) * 1000L / timescale)
                case "tkhd" if size >= 92 =>
                  w = Some((be32(p + 8 + 76) >>> 16).toInt)
                  h = Some((be32(p + 8 + 80) >>> 16).toInt)
                case _ => ()
              }
              p += size.toInt
            }
          }
          walk(0, b.length, 0)
          Some(VideoMeta(r.doc_id, r.media_type, Some("mp4"), w, h, dur, None))
        }

        def aviMeta(): Option[VideoMeta] = {
          if (b.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
            return None
          var out = Option.empty[VideoMeta]
          var p = 12
          while (out.isEmpty && p + 8 <= b.length) {
            val cc = fourcc(p)
            val csize = le32(p + 4).toInt
            if (cc == "LIST" && fourcc(p + 8) == "hdrl") {
              var q = p + 12
              val end = math.min(p + 8 + csize, b.length)
              while (out.isEmpty && q + 8 <= end) {
                if (fourcc(q) == "avih" && le32(q + 4) >= 40) {
                  val usec = le32(q + 8)
                  val frames = le32(q + 8 + 16)
                  out = Some(VideoMeta(r.doc_id, r.media_type, Some("avi"),
                    Some(le32(q + 8 + 32).toInt), Some(le32(q + 8 + 36).toInt),
                    Some(frames * usec / 1000L), Some(frames.toInt)))
                }
                q += 8 + le32(q + 4).toInt + (le32(q + 4).toInt & 1)
              }
            }
            p += 8 + csize + (csize & 1)
          }
          out
        }

        mp4Meta().orElse(aviMeta()).getOrElse(
          VideoMeta(r.doc_id, r.media_type, None, None, None, None, None))
      }
    }
  }

  /** Resize planning: aspect-preserving target dimensions fitting a
    * (maxW, maxH) box, never upscaling — pure integer expressions
    * (cross-multiplied comparison picks the binding side, integer
    * division floors), so the plan stays in codegen and is exactly
    * reproducible. The pixel resample consuming these dims is
    * [[resizePixels]] (images); video frames would need an external
    * codec in the same per-partition shape. */
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
    * against real bytes (video header metadata has its own real walk,
    * [[decodeVideoHeaders]]; frame pixels need a codec the JDK
    * lacks). Fixed-offset parse guarded by the RIFF/
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
