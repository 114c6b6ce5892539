package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis kernels for large-scale training-data pipelines
  * (SURVEY.md §2.H): normalization, tokenization, shingling, quality
  * stats, language-ID heuristics, fingerprints, SimHash.
  *
  * Everything is a native Catalyst expression (no UDFs) so the kernels
  * stay inside whole-stage codegen and scale as narrow per-row maps —
  * the only shuffles in any text query are the analytics on top.
  *
  * Hash discipline: every hash is md5 (hex string) or integers derived
  * from its prefix via base-16 conv — deliberately engine-portable so
  * the DuckDB oracle replays the same values bit-for-bit.
  */
object TextFunctions {

  /** Whitespace-collapsed lowercase form — the canonical text. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Tokens of the canonical text (single-space split). */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Word k-grams ("shingles") from a MATERIALIZED token-array column;
    * empty array when the document has fewer than k tokens.
    *
    * `toks` must be a plain column attribute (`withColumn` it first),
    * not an expression tree: lambda bodies re-evaluate captured child
    * expressions per element, so `element_at(split(...), i)` inside
    * `transform` re-runs the split for every shingle — O(tokens²) per
    * row. Against a materialized array column each access is O(1).
    */
  def shinglesOf(toks: Column, k: Int = 3): Column = {
    val make = transform(
      sequence(lit(0), size(toks) - k),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= k, make).otherwise(array().cast(ArrayType(StringType)))
  }

  /** Count of tokens found in `set` (stopword hits). */
  def hitCount(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(set.map(lit): _*), t)))

  /** Document fingerprint: md5 of the canonical text. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** 60-bit integer fingerprint (md5 prefix) — a join/bucket key that is
    * cheaper to shuffle than the hex string.
    */
  def fingerprint60(c: Column): Column =
    conv(substring(fingerprint(c), 1, 15), 16, 10).cast(LongType)

  /** One 32-bit half of the 64-bit SimHash token hash: 8 hex chars of an
    * (already materialized) md5 column starting at `hexOffset` (1-based).
    * The 64-bit hash is carried as TWO nonnegative 32-bit halves rather
    * than one signed 64-bit value so every bit probe below is a
    * shift-and-mask on a nonnegative int — portable to the DuckDB oracle
    * without leaning on any engine's signed-shift semantics.
    */
  def hash32(md5Hex: Column, hexOffset: Int): Column =
    conv(substring(md5Hex, hexOffset, 8), 16, 10).cast(LongType)

  /** SimHash vote for bit j (0–63) of the (hi, lo) 32-bit halves:
    * +1 / −1. Bits 0–31 live in `lo`, 32–63 in `hi`.
    */
  def bitVote64(hi: Column, lo: Column, j: Int): Column = {
    val (src, b) = if (j < 32) (lo, j) else (hi, j - 32)
    when(shiftright(src, b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)
  }

  /** Assemble a 64-bit SimHash (signed long, bit 63 = sign bit in two's
    * complement — exactly a BIGINT on the oracle side) from the 64
    * per-bit vote sums. The additions never overflow: bits 0–62 sum to
    * at most 2⁶³−1, and the bit-63 term is Long.MinValue, added last.
    */
  def simhashFromVotes64(votes: Seq[Column]): Column = {
    require(votes.size == 64, s"need 64 vote columns, got ${votes.size}")
    votes.zipWithIndex
      .map { case (v, j) =>
        val bit = if (j == 63) lit(Long.MinValue) else lit(1L << j)
        when(v > 0, bit).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Language-ID stopword sets (tiny n-gram-free heuristic: score each
    * language by stopword hits, pick the argmax). Deliberately small —
    * the point is the distributed scoring shape, not lexicon quality.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "de", "y", "es", "que", "una"),
    "fr" -> Seq("le", "les", "de", "et", "est", "que", "une"))
}
