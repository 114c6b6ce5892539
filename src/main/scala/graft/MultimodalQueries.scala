package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries (SURVEY.md §2.H). The corpus has no real
  * media, so each doc_id gets a REAL encoded payload from a closed-form
  * fixture recipe (driver-side, bounded — the documented fixture pattern
  * of e07/e15): a playable 16-bit PCM WAV and a valid PNG with true
  * CRCs. The decode then runs DISTRIBUTED as native byte-slicing
  * expressions (`Multimodal.wavPcm` / `pngIhdr`), and the oracle replays
  * the recipe's arithmetic — so a decoder that misreads any header field
  * or sample byte hash-mismatches.
  */
object MultimodalQueries {

  /** WAV PCM decode: RIFF/fmt/data little-endian header fields + exact
    * integer sum of squared samples + RMS, from real WAV bytes. The
    * metadata plumbing (size/checksum stamp, payload pruned after
    * decode) rides along.
    */
  val m01 = QueryDef(
    "m01_binary_features",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq // bounded fixture build
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.wavFixture(id))))
        .toDF("doc_id", "payload")
      val decoded = Multimodal.wavPcm(
        Multimodal.withPayload(payloads, col("payload"), "audio", "wav"), col("payload"))
      decoded.select(
        col("doc_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("sample_rate"), col("n_channels"), col("bits_per_sample"),
        col("n_samples"), col("sum_sq"), col("rms"), col("duration_ms"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(100 + doc_id % 50 AS INTEGER) AS n FROM documents),
      s AS (
        SELECT doc_id, n,
          list_transform(range(0, n),
            i -> (doc_id * 31 + i * 7) % 65536 - 32768) AS xs
        FROM d)
      SELECT doc_id,
        CAST(44 + n * 2 AS BIGINT) AS n_bytes,
        8000 AS sample_rate,
        1 AS n_channels,
        16 AS bits_per_sample,
        n AS n_samples,
        CAST(list_aggregate(list_transform(xs, x -> x * x), 'sum') AS BIGINT) AS sum_sq,
        sqrt(CAST(list_aggregate(list_transform(xs, x -> x * x), 'sum') AS DOUBLE) / n) AS rms,
        n * 1000.0 / 8000 AS duration_ms
      FROM s
    """.stripMargin.trim))

  /** PNG IHDR decode + CRC-32 integrity: big-endian dimensions, bit
    * depth, color type, the real crc32-vs-stored check (every 10th
    * fixture is corrupted and must flag false), and the following IDAT
    * chunk's deterministic stored-block length.
    */
  val m02 = QueryDef(
    "m02_frame_sample",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.pngFixture(id))))
        .toDF("doc_id", "payload")
      Multimodal.pngIhdr(payloads, col("payload"))
        .select(col("doc_id"), col("width"), col("height"),
          col("bit_depth"), col("color_type"), col("ihdr_crc_ok"),
          col("next_chunk_len"), col("next_chunk_type"))
    },
    Some("""
      SELECT doc_id,
        CAST(1 + doc_id % 16 AS INTEGER) AS width,
        CAST(1 + (doc_id * 7) % 12 AS INTEGER) AS height,
        8 AS bit_depth,
        2 AS color_type,
        doc_id % 10 <> 0 AS ihdr_crc_ok,
        CAST((1 + (doc_id * 7) % 12) * (1 + (1 + doc_id % 16) * 3) + 11 AS INTEGER)
          AS next_chunk_len,
        'IDAT' AS next_chunk_type
      FROM documents
    """.stripMargin.trim))

  /** Windowed audio features: the WAV samples cut into fixed 25-sample
    * frames, each frame reporting exact integer energy, peak |sample|,
    * and RMS — the frame-extraction primitive behind VAD energy gates
    * and per-frame loudness. One native codegen'd pass over the bytes
    * per row (`wav_frame_stats`), one array allocation, then a plain
    * `explode`: at 100 TB the decode stays a narrow distributed map
    * with no per-frame re-scan of the payload and no driver
    * involvement beyond the bounded fixture build.
    */
  val m03 = QueryDef(
    "m03_audio_frames",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq // bounded fixture build
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.wavFixture(id))))
        .toDF("doc_id", "payload")
      graft.multimodal.MediaFunctions.register(s)
      payloads
        .withColumn("fr", explode(expr("wav_frame_stats(payload, 25)")))
        .select(col("doc_id"), col("fr.frame").as("frame"),
          col("fr.fr_n").as("fr_n"), col("fr.fr_sum_sq").as("fr_sum_sq"),
          col("fr.fr_peak").as("fr_peak"))
        .withColumn("fr_rms", sqrt(col("fr_sum_sq").cast("double") / col("fr_n")))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, CAST(100 + doc_id % 50 AS INTEGER) AS n FROM documents),
      f AS (
        SELECT doc_id, n, unnest(range(0, CAST(ceil(n / 25.0) AS INTEGER))) AS frame
        FROM d),
      s AS (
        SELECT doc_id, frame,
          list_transform(range(frame * 25, LEAST(n, frame * 25 + 25)),
            i -> (doc_id * 31 + i * 7) % 65536 - 32768) AS xs
        FROM f)
      SELECT doc_id, CAST(frame AS INTEGER) AS frame,
        CAST(len(xs) AS INTEGER) AS fr_n,
        CAST(list_aggregate(list_transform(xs, x -> x * x), 'sum') AS BIGINT) AS fr_sum_sq,
        CAST(list_aggregate(list_transform(xs, x -> abs(x)), 'max') AS INTEGER) AS fr_peak,
        sqrt(CAST(list_aggregate(list_transform(xs, x -> x * x), 'sum') AS DOUBLE)
             / len(xs)) AS fr_rms
      FROM s
    """.stripMargin.trim))

  /** Image resize: nearest-neighbor 2× downsample over the REAL pixel
    * bytes (the PNG fixtures' IDAT is an uncompressed zlib stored
    * block, so scanlines are byte-addressable) — resized dims,
    * sampled-pixel count, exact integer intensity sum, and mean
    * channel intensity, all from one native codegen'd pass
    * (`png_resize_stats`). The oracle replays the closed-form pixel
    * recipe arithmetically, so a kernel that misreads the scanline
    * layout (filter bytes, row stride) hash-mismatches.
    */
  val m04 = QueryDef(
    "m04_image_resize",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.pngFixture(id))))
        .toDF("doc_id", "payload")
      graft.multimodal.MediaFunctions.register(s)
      payloads.withColumn("rs", expr("png_resize_stats(payload, 2)"))
        .select(col("doc_id"), col("rs.rw").as("rw"), col("rs.rh").as("rh"),
          col("rs.n_px").as("n_px"), col("rs.sum_intensity").as("sum_intensity"))
        .withColumn("mean_intensity",
          col("sum_intensity").cast("double") / (col("n_px") * 3))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
          CAST(1 + doc_id % 16 AS INTEGER) AS w,
          CAST(1 + (doc_id * 7) % 12 AS INTEGER) AS h
        FROM documents),
      r AS (SELECT doc_id, w, h, unnest(range(0, h, 2)) AS rr FROM d),
      c AS (SELECT doc_id, w, h, rr, unnest(range(0, w, 2)) AS cc FROM r),
      px AS (
        SELECT doc_id, w, h,
          (doc_id + rr * (1 + 3 * w) + 1 + 3 * cc) % 251
          + (doc_id + rr * (1 + 3 * w) + 2 + 3 * cc) % 251
          + (doc_id + rr * (1 + 3 * w) + 3 + 3 * cc) % 251 AS s
        FROM c)
      SELECT doc_id,
        CAST((w + 1) // 2 AS INTEGER) AS rw,
        CAST((h + 1) // 2 AS INTEGER) AS rh,
        CAST(((w + 1) // 2) * ((h + 1) // 2) AS INTEGER) AS n_px,
        CAST(SUM(s) AS BIGINT) AS sum_intensity,
        CAST(SUM(s) AS DOUBLE) / (((w + 1) // 2) * ((h + 1) // 2) * 3) AS mean_intensity
      FROM px GROUP BY doc_id, w, h
    """.stripMargin.trim))

  /** JPEG frame-header decode (`jpeg_sof`): dimensions, sample
    * precision, and component count pulled from real encoded baseline
    * JPEG byte streams by walking the marker segments (SOI → APP0 →
    * DQT → SOF0 here; APPn/EXIF soup in the wild) — rounding out the
    * image side for the corpora that are mostly JPEG, not PNG. Every
    * 10th fixture carries a corrupted SOF marker prefix and must come
    * back null-flagged (`jpg_ok = false`), never misparsed. Narrow
    * codegen'd map like m01–m04; the oracle replays the fixture's
    * closed-form dims.
    */
  val m05 = QueryDef(
    "m05_jpeg_header",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq // bounded fixture build
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.jpegFixture(id))))
        .toDF("doc_id", "payload")
      graft.multimodal.MediaFunctions.register(s)
      payloads.withColumn("sof", expr("jpeg_sof(payload)"))
        .select(col("doc_id"),
          col("sof").isNotNull.as("jpg_ok"),
          col("sof.sof_marker").as("sof_marker"),
          col("sof.sof_precision").as("sof_precision"),
          col("sof.height").as("height"),
          col("sof.width").as("width"),
          col("sof.n_components").as("n_components"))
    },
    Some("""
      SELECT doc_id,
        doc_id % 10 <> 0 AS jpg_ok,
        CASE WHEN doc_id % 10 <> 0 THEN 192 END AS sof_marker,
        CASE WHEN doc_id % 10 <> 0 THEN 8 END AS sof_precision,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(1 + (doc_id * 13) % 150 AS INTEGER) END AS height,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(1 + doc_id % 200 AS INTEGER) END AS width,
        CASE WHEN doc_id % 10 <> 0 THEN 3 END AS n_components
      FROM documents
    """.stripMargin.trim))

  /** MP4 container decode (`mp4_meta`): major brand, movie timescale /
    * duration, and the first track's id and pixel dimensions pulled
    * from real ISO-BMFF byte streams by walking nested variable-size
    * boxes (ftyp → free → moov{udta → mvhd → trak{tkhd}} → mdat here;
    * free/udta/meta soup in the wild) — the container modality a real
    * multimodal corpus is mostly made of. Every 10th fixture inflates
    * its mvhd size past the moov parent and must come back null-flagged
    * (`mp4_ok = false`), never misparsed or over-read. Narrow codegen'd
    * map like m01–m05; the oracle replays the fixture's closed-form
    * values, and `duration_s` is one double division of two exact
    * integers — bit-identical on both engines.
    */
  val m06 = QueryDef(
    "m06_mp4_container",
    (s, dir) => {
      import s.implicits._
      val ids = Tables.documents(s, dir).select("doc_id")
        .as[Long].collect().sorted.toIndexedSeq // bounded fixture build
      val payloads = s.createDataFrame(ids.map(id => (id, Multimodal.mp4Fixture(id))))
        .toDF("doc_id", "payload")
      graft.multimodal.MediaFunctions.register(s)
      payloads.withColumn("m", expr("mp4_meta(payload)"))
        .select(col("doc_id"),
          col("m").isNotNull.as("mp4_ok"),
          col("m.major_brand").as("major_brand"),
          col("m.timescale").as("timescale"),
          col("m.duration").as("duration"),
          (col("m.duration").cast("double") / col("m.timescale")).as("duration_s"),
          col("m.track_id").as("track_id"),
          col("m.width").as("width"),
          col("m.height").as("height"))
    },
    Some("""
      SELECT doc_id,
        doc_id % 10 <> 0 AS mp4_ok,
        CASE WHEN doc_id % 10 <> 0 THEN 'isom' END AS major_brand,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(1000 + (doc_id % 9) * 100 AS INTEGER) END AS timescale,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(1000 + (doc_id * 37) % 100000 AS BIGINT) END AS duration,
        CASE WHEN doc_id % 10 <> 0 THEN
          CAST(1000 + (doc_id * 37) % 100000 AS DOUBLE) / (1000 + (doc_id % 9) * 100) END AS duration_s,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(1 + doc_id % 5 AS INTEGER) END AS track_id,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(16 + doc_id % 320 AS INTEGER) END AS width,
        CASE WHEN doc_id % 10 <> 0 THEN CAST(16 + (doc_id * 7) % 240 AS INTEGER) END AS height
      FROM documents
    """.stripMargin.trim))

  def all: Seq[QueryDef] = Seq(m01, m02, m03, m04, m05, m06)
}
