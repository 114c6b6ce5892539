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

  def all: Seq[QueryDef] = Seq(m01)
}
