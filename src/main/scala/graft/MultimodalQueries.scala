package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries (SURVEY.md §2.H). Payloads are synthesized
  * from document text (cast to UTF-8 bytes) since the test corpus has no
  * real media; the decode step is the documented deterministic stub.
  */
object MultimodalQueries {

  /** Binary payload + metadata + stub feature extraction: the full
    * multimodal plumbing end-to-end — attach payload, stamp typed
    * metadata (size, checksum), extract features, prune payload.
    */
  val m01 = QueryDef(
    "m01_binary_features",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val withBin = Multimodal.withPayload(docs, col("text"), "image", "fake")
      Multimodal.extractFeatures(withBin.drop("text"))
        .select(col("doc_id"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.checksum").as("checksum"),
          col("f0"), col("f1"), col("f2"), col("f3"))
    },
    Some("""
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        sha256(text) AS checksum,
        ('0x' || substr(md5(text), 1, 8))::BIGINT / 4294967295.0 AS f0,
        ('0x' || substr(md5(text), 9, 8))::BIGINT / 4294967295.0 AS f1,
        ('0x' || substr(md5(text), 17, 8))::BIGINT / 4294967295.0 AS f2,
        ('0x' || substr(md5(text), 25, 8))::BIGINT / 4294967295.0 AS f3
      FROM documents
    """.stripMargin.trim))

  /** Frame sampling: every 4th 16-byte block of the payload (as hex)
    * hashed and combined — the video-frame-sample plumbing shape: a
    * bounded per-row sample of an opaque payload, no shuffle, payload
    * pruned after. The "frame decode" on each sampled block is the
    * documented md5 stub.
    */
  val m02 = QueryDef(
    "m02_frame_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val hexp = lower(hex(col("text").cast("binary")))
      val nBlocks = ceil(length(hexp) / 32.0).cast("int")
      val sampled = transform(
        sequence(lit(0), nBlocks - 1, lit(4)),
        i => md5(substring(hexp, i * 32 + 1, lit(32))))
      docs.select(
        col("doc_id"),
        nBlocks.as("n_blocks"),
        size(sampled).as("n_sampled"),
        md5(concat_ws("", sampled)).as("sample_fingerprint"))
    },
    Some("""
      SELECT doc_id,
        CAST(n_blocks AS INTEGER) AS n_blocks,
        CAST(len(hashes) AS INTEGER) AS n_sampled,
        md5(list_aggregate(hashes, 'string_agg', '')) AS sample_fingerprint
      FROM (
        SELECT doc_id, n_blocks,
          list_transform(range(0, n_blocks, 4),
            i -> md5(substring(hexp, CAST(i * 32 + 1 AS INTEGER), 32))) AS hashes
        FROM (
          SELECT doc_id, lower(hex(encode(text))) AS hexp,
            CAST(ceil(length(hex(encode(text))) / 32.0) AS INTEGER) AS n_blocks
          FROM documents))
    """.stripMargin.trim))

  def all: Seq[QueryDef] = Seq(m01, m02)
}
