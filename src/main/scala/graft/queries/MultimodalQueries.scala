package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** Multimodal extension queries (SURVEY.md §7.5): binary payload
  * metadata plumbing plus REAL zero-dependency header decodes
  * (PNG/JPEG magic + dimensions, canonical PCM WAV fmt chunk). */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------
    // Multimodal: binary payload + deterministic fake decode metadata
    // ---------------------------------------------------------------
    Q("q43_multimodal_meta",
      (s, dir) => Multimodal.withFakeDecodeMeta(
          Multimodal.asMedia(Tables(s, dir, "documents"), "doc_id", "text", "text/plain"))
        .select("doc_id", "byte_len", "width", "height", "n_frames")
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               octet_length(text::BLOB)::BIGINT AS byte_len,
               (16 + ('0x' || substr(md5(text), 1, 2))::BIGINT % 64)::INT AS width,
               (16 + ('0x' || substr(md5(text), 3, 2))::BIGINT % 64)::INT AS height,
               (1 + ('0x' || substr(md5(text), 5, 2))::BIGINT % 8)::INT AS n_frames
        FROM documents ORDER BY doc_id"""),
      "multimodal plumbing: payload bytes + md5-derived fake header decode"),

    // ---------------------------------------------------------------
    // Multimodal: REAL header decode round-trip. Valid PNG headers are
    // constructed from per-doc dims, then BOTH decode tiers (the
    // expression-level IHDR parse and the mapPartitions marker walk)
    // read the dims back from the bytes. The oracle computes the
    // expected dims INDEPENDENTLY — it never sees the payload — so any
    // drift in construct or either parse path fails the hash.
    // ---------------------------------------------------------------
    Q("q89_png_header_decode",
      (s, dir) => {
        val media = Tables(s, dir, "documents").select(
          col("doc_id"),
          lit("image/png").as("media_type"),
          Multimodal.pngHeaderPayload(
            (lit(16) + col("doc_id") % 2048).cast("int"),
            (lit(16) + (col("doc_id") * 7) % 1536).cast("int")).as("payload"))
        val exprTier = Multimodal.withPngHeaderMeta(media)
          .select(col("doc_id"), col("byte_len"),
            col("width").as("w_expr"), col("height").as("h_expr"))
        val walkTier = Multimodal.decodeHeaders(s, media).toDF()
          .select(col("doc_id"), col("container"),
            col("width").as("w_walk"), col("height").as("h_walk"))
        exprTier.join(walkTier, "doc_id").orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               33::BIGINT AS byte_len,
               (16 + doc_id % 2048)::INT AS w_expr,
               (16 + (doc_id * 7) % 1536)::INT AS h_expr,
               'png' AS container,
               (16 + doc_id % 2048)::INT AS w_walk,
               (16 + (doc_id * 7) % 1536)::INT AS h_walk
        FROM documents ORDER BY doc_id"""),
      "real PNG IHDR decode, both tiers, vs an oracle that never sees the bytes"),

    // ---------------------------------------------------------------
    // Multimodal: REAL WAV header decode round-trip — the audio twin
    // of q89. Canonical PCM headers constructed from per-doc formats,
    // read back by the expression-tier parser; the oracle computes the
    // expected fields without ever seeing the bytes.
    // ---------------------------------------------------------------
    Q("q100_wav_header_decode",
      (s, dir) => {
        val media = Tables(s, dir, "documents").select(
          col("doc_id"),
          lit("audio/wav").as("media_type"),
          Multimodal.wavHeaderPayload(
            (lit(1) + col("doc_id") % 2).cast("int"),
            (lit(8000) + (col("doc_id") % 6) * 8000).cast("int"),
            (lit(8) + (col("doc_id") % 3) * 8).cast("int")).as("payload"))
        Multimodal.withWavHeaderMeta(media)
          .select("doc_id", "byte_len", "channels", "sample_rate",
            "bits_per_sample")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               36::BIGINT AS byte_len,
               (1 + doc_id % 2)::INT AS channels,
               (8000 + (doc_id % 6) * 8000)::INT AS sample_rate,
               (8 + (doc_id % 3) * 8)::INT AS bits_per_sample
        FROM documents ORDER BY doc_id"""),
      "real WAV fmt-chunk decode (little-endian fields) vs a bytes-blind oracle"),

    // ---------------------------------------------------------------
    // Multimodal: REAL pixel decode through the JDK's own ImageIO PNG
    // codec. Deterministic gray-gradient PNGs are ENCODED executor-side
    // (ImageIO.write), then decodePixels reads the raster back and
    // derives exact integer channel sums; the header-parse dims ride
    // along and must agree with the decoded raster's. PNG is lossless,
    // so the oracle predicts every field from (doc_id) alone — it
    // never sees a byte of image data. Real pixel access for images;
    // video header metadata is likewise real (q124), only frame-pixel
    // decode would need a codec the JDK lacks.
    // ---------------------------------------------------------------
    Q("q103_image_pixel_decode",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { ids =>
            ids.map { id =>
              Multimodal.MediaRow(id, "image/png", Multimodal.generatePng(
                (8 + id % 9).toInt, (8 + (id * 3) % 9).toInt, seed = id))
            }
          }.toDF()
        Multimodal.decodePixels(s, media).toDF()
          .select(col("doc_id"), col("container"),
            col("width"), col("height"), col("px_width"), col("px_height"),
            col("rgb_sum"),
            round(col("rgb_sum") /
              (col("px_width") * col("px_height") * lit(3.0)), 4)
              .as("mean_luma"))
          .orderBy("doc_id")
      },
      Some("""
        WITH dims AS (SELECT doc_id,
                             (8 + doc_id % 9)::INT AS w,
                             (8 + (doc_id * 3) % 9)::INT AS h
                      FROM documents),
        px AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM dims),
        pxy AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM px),
        s AS (SELECT doc_id, w, h,
                     sum(3 * ((doc_id + 7 * x + 13 * y) % 256))::BIGINT AS rgb_sum
              FROM pxy GROUP BY 1, 2, 3)
        SELECT doc_id, 'png' AS container, w AS width, h AS height,
               w AS px_width, h AS px_height, rgb_sum,
               round(rgb_sum / (w * h * 3.0), 4) AS mean_luma
        FROM s ORDER BY doc_id"""),
      "real ImageIO raster decode: exact pixel sums vs a bytes-blind analytic oracle"),

    // ---------------------------------------------------------------
    // Multimodal: REAL image resize — ImageIO decode + explicit
    // nearest-neighbor resample (src index = dst index * src_dim div
    // dst_dim), so the oracle can reproduce the EXACT sampling grid
    // analytically and predict the resized raster's channel sum from
    // doc_id alone. The thumbnailing stage of an image-curation
    // pipeline, end-to-end real.
    // ---------------------------------------------------------------
    Q("q117_image_resize",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { ids =>
            ids.map { id =>
              Multimodal.MediaRow(id, "image/png", Multimodal.generatePng(
                (8 + id % 9).toInt, (8 + (id * 3) % 9).toInt, seed = id))
            }
          }.toDF()
        Multimodal.resizePixels(s, media, dstW = 5, dstH = 4).toDF()
          .select(col("doc_id"), col("src_w"), col("src_h"),
            col("dst_w"), col("dst_h"), col("rgb_sum"),
            round(col("rgb_sum") / lit(5 * 4 * 3.0), 4).as("mean_luma"))
          .orderBy("doc_id")
      },
      Some("""
        WITH dims AS (SELECT doc_id,
                             (8 + doc_id % 9)::INT AS w,
                             (8 + (doc_id * 3) % 9)::INT AS h
                      FROM documents),
        px AS (SELECT doc_id, w, h, unnest(range(0, 5)) AS x FROM dims),
        pxy AS (SELECT doc_id, w, h, x, unnest(range(0, 4)) AS y FROM px),
        s AS (SELECT doc_id, w, h,
                     sum(3 * ((doc_id + 7 * ((x * w) // 5)
                                      + 13 * ((y * h) // 4)) % 256))::BIGINT AS rgb_sum
              FROM pxy GROUP BY 1, 2, 3)
        SELECT doc_id, w AS src_w, h AS src_h, 5 AS dst_w, 4 AS dst_h,
               rgb_sum, round(rgb_sum / 60.0, 4) AS mean_luma
        FROM s ORDER BY doc_id"""),
      "real NN resample: resized-raster channel sums vs a bytes-blind analytic oracle"),

    // ---------------------------------------------------------------
    // Multimodal: REAL byte-level frame sampling over PCM audio —
    // canonical 8-bit WAV payloads with a deterministic sample walk,
    // every 7th sample kept by walking the actual data chunk. The
    // audio analogue of video frame-striding, against real bytes
    // (video itself is the one remaining stub: no codec in the JDK).
    // ---------------------------------------------------------------
    Q("q118_audio_frame_sample",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { ids =>
            ids.map { id =>
              Multimodal.MediaRow(id, "audio/wav", Multimodal.generateWavPcm(
                (200 + id % 100).toInt, seed = id))
            }
          }.toDF()
        Multimodal.samplePcmFrames(s, media, stride = 7).toDF()
          .select(col("doc_id"), col("n_samples"), col("n_sampled"),
            col("sample_sum"),
            round(col("sample_sum") / col("n_sampled"), 4).as("mean_sample"))
          .orderBy("doc_id")
      },
      Some("""
        WITH n AS (SELECT doc_id, (200 + doc_id % 100)::INT AS n_samples
                   FROM documents),
        sampled AS (SELECT doc_id, n_samples, unnest(range(0, n_samples, 7)) AS i
                    FROM n),
        s AS (SELECT doc_id, n_samples,
                     count(*)::INT AS n_sampled,
                     sum((doc_id + 11 * i) % 256)::BIGINT AS sample_sum
              FROM sampled GROUP BY 1, 2)
        SELECT doc_id, n_samples, n_sampled, sample_sum,
               round(sample_sum / n_sampled, 4) AS mean_sample
        FROM s ORDER BY doc_id"""),
      "real PCM data-chunk stride sampling vs a bytes-blind analytic oracle"),

    // ---------------------------------------------------------------
    // Multimodal: REAL video container header decode — canonical MP4
    // (ISO-BMFF ftyp/moov/mvhd/trak/tkhd, big-endian box walk) for
    // even doc_ids, canonical AVI (RIFF LIST/hdrl/avih, little-endian
    // chunk walk) for odd. Width/height/duration (and AVI frame
    // count; MP4 keeps frame counts in sample tables → null) are read
    // back from the real bytes; the oracle predicts every field from
    // doc_id alone. Retires the last decode stub: all five container
    // families (PNG, JPEG, WAV, MP4, AVI) now parse real headers.
    // ---------------------------------------------------------------
    Q("q124_video_header_decode",
      (s, dir) => {
        import s.implicits._
        val media = Tables(s, dir, "documents")
          .select(col("doc_id").cast("long")).as[Long]
          .mapPartitions { ids =>
            ids.map { id =>
              val w = (16 + id % 2048).toInt
              val h = (16 + (id * 7) % 1536).toInt
              if (id % 2 == 0)
                Multimodal.MediaRow(id, "video/mp4",
                  Multimodal.generateMp4(w, h, durationMs = 1000 + id % 5000))
              else
                Multimodal.MediaRow(id, "video/x-msvideo",
                  Multimodal.generateAvi(w, h, nFrames = (10 + id % 240).toInt,
                    usecPerFrame = 40000))
            }
          }.toDF()
        Multimodal.decodeVideoHeaders(s, media).toDF()
          .select("doc_id", "container", "width", "height",
            "duration_ms", "n_frames")
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
               (16 + doc_id % 2048)::INT AS width,
               (16 + (doc_id * 7) % 1536)::INT AS height,
               (CASE WHEN doc_id % 2 = 0 THEN 1000 + doc_id % 5000
                     ELSE (10 + doc_id % 240) * 40 END)::BIGINT AS duration_ms,
               CASE WHEN doc_id % 2 = 0 THEN NULL
                    ELSE (10 + doc_id % 240)::INT END AS n_frames
        FROM documents ORDER BY doc_id"""),
      "real MP4/AVI header walks (box sizes, not fixed offsets) vs a bytes-blind oracle")
  )
}
