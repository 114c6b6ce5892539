package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Real pure-JVM media decode: WAV PCM fields + exact sample energy, PNG
  * IHDR fields + CRC-32 integrity — verified against javax.imageio-free
  * hand-computed expectations on real encoded bytes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("wavPcm decodes header fields and exact sample energy from real bytes") {
    val id = 7L
    val df = spark.createDataFrame(Seq((id, Multimodal.wavFixture(id)))).toDF("doc_id", "payload")
    val row = Multimodal.wavPcm(df, col("payload"))
      .select("__wav_ok", "sample_rate", "n_channels", "bits_per_sample",
        "n_samples", "sum_sq").head()
    assert(row.getBoolean(0), "RIFF/WAVE/fmt/data magic must validate")
    assert(row.getInt(1) == 8000 && row.getInt(2) == 1 && row.getInt(3) == 16)
    val n = (100 + id % 50).toInt
    assert(row.getInt(4) == n)
    val expected = (0 until n).map { i =>
      val s = (id * 31 + i * 7) % 65536 - 32768; s * s
    }.sum
    assert(row.getLong(5) == expected, "decoded samples must match the encoded PCM exactly")
  }

  test("wavPcm rejects a non-WAV payload via the magic check") {
    val df = Seq((1L, "not a wav at all, just text bytes".getBytes)).toDF("doc_id", "payload")
    assert(!Multimodal.wavPcm(df, col("payload")).select("__wav_ok").head().getBoolean(0))
  }

  test("pngIhdr decodes dimensions and verifies the real CRC-32") {
    val good = 13L // 13 % 10 != 0 → intact
    val bad = 20L  // corrupted fixture
    val df = spark.createDataFrame(
      Seq((good, Multimodal.pngFixture(good)), (bad, Multimodal.pngFixture(bad))))
      .toDF("doc_id", "payload")
    val out = Multimodal.pngIhdr(df, col("payload"))
      .select("doc_id", "__png_ok", "width", "height", "bit_depth",
        "color_type", "ihdr_crc_ok", "next_chunk_type")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(good).getBoolean(1) && out(bad).getBoolean(1)) // both real PNGs
    assert(out(good).getInt(2) == (1 + good % 16).toInt)
    assert(out(good).getInt(3) == (1 + good * 7 % 12).toInt)
    assert(out(good).getInt(4) == 8 && out(good).getInt(5) == 2)
    assert(out(good).getBoolean(6), "intact IHDR must pass the CRC check")
    assert(!out(bad).getBoolean(6), "flipped CRC byte must be flagged")
    assert(out(good).getString(7) == "IDAT")
  }

  test("png fixture is a structurally valid zlib/PNG (adler + stored block)") {
    // independently decompress the IDAT zlib stream with java.util.zip —
    // proves the fixture is a real PNG body, not just CRC-consistent bytes
    val png = Multimodal.pngFixture(3L)
    val idatLen = java.nio.ByteBuffer.wrap(png.slice(33, 37)).getInt
    val idat = png.slice(41, 41 + idatLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val out = new Array[Byte](1 << 16)
    val m = inf.inflate(out)
    inf.end()
    val w = (1 + 3 % 16); val h = (1 + 3 * 7 % 12)
    assert(m == h * (1 + w * 3), "inflated scanlines must match height*(1+3*width)")
  }

  test("wav frame stats partition the file: energies sum to wav_sum_sq, sizes to n") {
    import graft.multimodal.{MediaFunctions, WavMath}
    MediaFunctions.register(spark)
    val ids = Seq(0L, 7L, 49L, 123L) // n = 100, 107, 149, 123
    val df = spark.createDataFrame(ids.map(id => (id, Multimodal.wavFixture(id))))
      .toDF("doc_id", "payload")
    val rows = df.selectExpr("doc_id", "wav_sum_sq(payload) AS total",
        "explode(wav_frame_stats(payload, 25)) AS fr")
      .selectExpr("doc_id", "total", "fr.frame", "fr.fr_n", "fr.fr_sum_sq", "fr.fr_peak")
      .collect()
    ids.foreach { id =>
      val mine = rows.filter(_.getLong(0) == id).sortBy(_.getInt(2))
      val n = (100 + id % 50).toInt
      assert(mine.map(_.getInt(3)).sum == n, s"id=$id frame sizes must tile n")
      assert(mine.map(_.getLong(4)).sum == WavMath.sumSq(Multimodal.wavFixture(id)),
        s"id=$id frame energies must sum to the whole-file energy")
      assert(mine.map(_.getInt(2)).toSeq == (0 until (n + 24) / 25),
        s"id=$id frames must be contiguous from 0")
      mine.foreach { r =>
        assert(r.getInt(5) >= 0 && r.getInt(5) <= 32768)
        assert(r.getLong(4) <= r.getInt(3).toLong * 32768L * 32768L)
      }
    }
    // short frames only in the LAST frame
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getInt(2))
      sorted.dropRight(1).foreach(r => assert(r.getInt(3) == 25, s"id=$id interior frame short"))
    }
  }

  test("png resize: kernel sum equals an independent Inflater-decoded resample") {
    import graft.multimodal.MediaFunctions
    MediaFunctions.register(spark)
    val ids = Seq(1L, 3L, 10L, 47L) // incl. a corrupt-IHDR-CRC fixture (10)
    val df = spark.createDataFrame(ids.map(id => (id, Multimodal.pngFixture(id))))
      .toDF("doc_id", "payload")
    val got = df.selectExpr("doc_id", "png_resize_stats(payload, 2) AS rs")
      .selectExpr("doc_id", "rs.rw", "rs.rh", "rs.n_px", "rs.sum_intensity")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    ids.foreach { id =>
      // independently inflate the IDAT and resample on the JVM side
      val png = Multimodal.pngFixture(id)
      val idatLen = java.nio.ByteBuffer.wrap(png.slice(33, 37)).getInt
      val inf = new java.util.zip.Inflater()
      inf.setInput(png.slice(41, 41 + idatLen))
      val raw = new Array[Byte](1 << 16)
      val m = inf.inflate(raw); inf.end()
      val w = (1 + id % 16).toInt; val h = (1 + id * 7 % 12).toInt
      assert(m == h * (1 + 3 * w))
      var sum = 0L
      for (r <- 0 until h by 2; c <- 0 until w by 2; ch <- 0 until 3)
        sum += raw(r * (1 + 3 * w) + 1 + 3 * c + ch) & 0xFF
      assert(got(id) == (((w + 1) / 2, (h + 1) / 2, ((w + 1) / 2) * ((h + 1) / 2), sum)), s"id=$id")
    }
  }

  test("wav frame stats guard: garbage/short payloads yield no frames") {
    import graft.multimodal.MediaFunctions
    MediaFunctions.register(spark)
    val df = spark.createDataFrame(Seq(
        (1L, Array[Byte](1, 2, 3)),
        (2L, Array.fill[Byte](10)(0))))
      .toDF("doc_id", "payload")
    val n = df.selectExpr("size(wav_frame_stats(payload, 25)) AS k").collect()
    assert(n.forall(_.getInt(0) == 0))
  }

  test("jpeg_sof walks the segment chain; malformed streams are null, never misparsed") {
    import graft.multimodal.{JpegMath, Multimodal}
    import org.apache.spark.sql.catalyst.InternalRow
    def sof(b: Array[Byte]) = Option(JpegMath.sof(b)).map(_.asInstanceOf[InternalRow])
    // round-trip: the real fixture bytes decode back to the closed form
    val ok = sof(Multimodal.jpegFixture(7L)).get
    assert((ok.getInt(0), ok.getInt(1), ok.getInt(2), ok.getInt(3), ok.getInt(4)) ==
      (0xC0, 8, (1 + 7 * 13 % 150), (1 + 7 % 200), 3))
    // an EXTRA unknown APPn segment before SOF must be walked over
    val base = Multimodal.jpegFixture(7L)
    val extra = Array(0xFF, 0xE7, 0x00, 0x06, 1, 2, 3, 4).map(_.toByte)
    val padded = base.take(2) ++ extra ++ base.drop(2)
    assert(sof(padded).get.getInt(3) == 1 + 7 % 200)
    // fill-byte padding (FF FF FF C0) is legal prefix stuffing
    val filled = base.take(89) ++ Array(0xFF.toByte, 0xFF.toByte) ++ base.drop(89)
    assert(sof(filled).get.getInt(2) == 1 + 7 * 13 % 150)
    // progressive SOF2 is still a frame header
    val prog = base.clone(); prog(90) = 0xC2.toByte
    assert(sof(prog).get.getInt(0) == 0xC2)
    // corrupt SOF marker prefix (the every-10th fixture) → null
    assert(sof(Multimodal.jpegFixture(10L)).isEmpty)
    // missing SOI, truncation mid-segment, SOS before any SOF → null
    assert(sof(base.drop(2)).isEmpty)
    assert(sof(base.take(95)).isEmpty)
    val noSof = base.take(89) ++ base.drop(108) // splice the SOF segment out
    assert(sof(noSof).isEmpty)
    // a SOF whose declared length disagrees with its component count → null
    val badLen = base.clone(); badLen(92) = 20.toByte // len 17 → 20
    assert(sof(badLen).isEmpty)
  }

  test("wav frame stats guard: stereo and non-16-bit payloads are rejected, not mis-sliced") {
    import graft.multimodal.{MediaFunctions, Multimodal}
    MediaFunctions.register(spark)
    val mono = Multimodal.wavFixture(7L)
    val stereo = mono.clone(); stereo(22) = 2 // channels = 2
    val eightBit = mono.clone(); eightBit(34) = 8 // bits-per-sample = 8
    val df = spark.createDataFrame(Seq(
        (1L, mono), (2L, stereo), (3L, eightBit)))
      .toDF("doc_id", "payload")
    val got = df.selectExpr("doc_id", "size(wav_frame_stats(payload, 25)) AS k",
        "wav_sum_sq(payload) AS e")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got(1L)._1 > 0 && got(1L)._2 > 0, "canonical mono 16-bit must still decode")
    assert(got(2L) == ((0, 0L)), "stereo must be rejected by BOTH kernels (interleaved otherwise)")
    assert(got(3L) == ((0, 0L)), "8-bit must be rejected by BOTH kernels (mis-sliced otherwise)")
  }

  test("mp4_meta walks nested boxes; v1 and largesize variants; corrupt sizes are null") {
    import graft.multimodal.{Mp4Math, Multimodal}
    // the fixture chain (v0 boxes behind free/udta noise) decodes
    val m = Mp4Math.meta(Multimodal.mp4Fixture(3L))
    assert(m != null)
    assert(m.getUTF8String(0).toString == "isom")
    assert(m.getInt(1) == 1300 && m.getLong(2) == 1111L) // 1000+(3%9)*100, 1000+111
    assert(m.getInt(3) == 4 && m.getInt(4) == 19 && m.getInt(5) == 37)
    // the corrupt-size fixture is null, never over-read
    assert(Mp4Math.meta(Multimodal.mp4Fixture(10L)) == null)

    // hand-rolled v1 mvhd/tkhd with 64-bit fields, plus a LARGESIZE
    // (size==1 + 64-bit length) moov — the modern-file variants
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32((v >> 32).toInt) ++ be32(v.toInt)
    def boxOf(t: String, payload: Array[Byte]) = be32(payload.length + 8) ++ t.getBytes ++ payload
    val mvhd1 = boxOf("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(5L) ++ be64(6L) ++ be32(90000) ++ be64(123456789L) ++
        Array.fill[Byte](80)(0))
    val tkhd1 = boxOf("tkhd",
      Array[Byte](1, 0, 0, 7) ++ be64(0L) ++ be64(0L) ++ be32(9) ++ be32(0) ++ be64(42L) ++
        Array.fill[Byte](8 + 8)(0) ++ Array.fill[Byte](36)(0) ++
        be32(1920 << 16) ++ be32(1080 << 16))
    val moovPayload = mvhd1 ++ boxOf("trak", tkhd1)
    val moovLarge = be32(1) ++ "moov".getBytes ++ be64(moovPayload.length + 16L) ++ moovPayload
    val ftyp = boxOf("ftyp", "mp42".getBytes ++ be32(0) ++ "mp42".getBytes)
    val v1 = Mp4Math.meta(ftyp ++ moovLarge)
    assert(v1 != null, "v1/largesize container must decode")
    assert(v1.getUTF8String(0).toString == "mp42")
    assert(v1.getInt(1) == 90000 && v1.getLong(2) == 123456789L)
    assert(v1.getInt(3) == 9 && v1.getInt(4) == 1920 && v1.getInt(5) == 1080)
  }
}
