package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (SURVEY.md §2.H): opaque binary payloads
  * (image/audio/video bytes) carried as `BinaryType` columns with a
  * typed metadata struct, plus the decode / feature-extract plumbing.
  *
  * The actual media decoders are NOT available in this environment, so
  * `fakeDecode` stands in as a clearly-marked deterministic stub: it
  * derives pseudo-features from the md5 of the payload. Everything
  * around it — the schema, the batched per-partition execution shape,
  * the partition-size control — is the real plumbing a decoder plugs
  * into.
  *
  * Scale notes: payloads dominate row size, so feature extraction must
  * (a) run as a narrow map (no shuffle of payload bytes), (b) prune the
  * payload column as soon as features are extracted, and (c) bound
  * partition bytes via `spark.sql.files.maxPartitionBytes` rather than
  * row counts.
  */
object Multimodal {

  /** Metadata struct carried next to every payload column. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("encoding", StringType),     // e.g. "jpeg", "wav"
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))    // sha2-256 hex

  /** Attach a payload (binary) + metadata struct derived from a source
    * column. In a real pipeline the payload comes off object storage;
    * here any column is castable for testing.
    */
  def withPayload(df: DataFrame, src: Column, mediaType: String, encoding: String): DataFrame =
    df.withColumn("payload", src.cast(BinaryType))
      .withColumn("media_meta", struct(
        lit(mediaType).as("media_type"),
        lit(encoding).as("encoding"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        sha2(col("payload"), 256).as("checksum")))

  /** STUB — deterministic fake decoder. Real media decoding would run
    * here (per-partition, batched, native library); the stub derives a
    * k-dim pseudo-feature vector from md5(payload) so tests and oracles
    * are reproducible. Each feature is an 8-hex-digit slice of the md5
    * scaled to [0, 1]. md5 has 32 hex chars → k ≤ 4.
    */
  def fakeDecodeFeature(payload: Column, j: Int): Column = {
    require(j >= 0 && j < 4, "md5 yields 4 8-hex-digit features")
    conv(substring(md5(payload), 8 * j + 1, 8), 16, 10).cast(DoubleType) / 4294967295.0
  }

  /** Feature extraction: payload → fixed feature columns, payload
    * pruned from the output (rule (b) above).
    */
  def extractFeatures(df: DataFrame, nFeatures: Int = 4): DataFrame = {
    val feats = (0 until nFeatures).map(j =>
      fakeDecodeFeature(col("payload"), j).as(s"f$j"))
    df.select((df.columns.toIndexedSeq.filter(c => c != "payload").map(col) ++ feats): _*)
  }
}
