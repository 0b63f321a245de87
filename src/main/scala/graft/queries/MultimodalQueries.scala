package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** North-star extension operators (SURVEY.md §7.5) as oracle-checked
  * queries: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  * similarity search (brute-force + random-hyperplane LSH ANN), text
  * analysis (lang-ID, quality, token counts, fingerprint, tf-idf) and
  * multimodal metadata plumbing.
  *
  * Sketch oracles are EXACT, not rows-only: all hashing goes through
  * [[graft.ext.DetHash]] (md5-prefix integers) which evaluates to the
  * same values in DuckDB, and parts of the oracle SQL are *generated
  * from the same frozen constants* as the Spark plan, so the two sides
  * cannot drift.
  */

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
      "real WAV fmt-chunk decode (little-endian fields) vs a bytes-blind oracle")
  )
}
