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

  /** Per-token 16-bit hash for SimHash: first 4 hex chars of md5. */
  def tokenHash16(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast(IntegerType)

  /** SimHash vote for bit j of a 16-bit token hash: +1 / −1. */
  def bitVote(h16: Column, j: Int): Column =
    when(shiftright(h16, j).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)

  /** Assemble a 16-bit SimHash from the 16 per-bit vote sums. */
  def simhashFromVotes(votes: Seq[Column]): Column =
    votes.zipWithIndex
      .map { case (v, j) => when(v > 0, lit(1 << j)).otherwise(lit(0)) }
      .reduce(_ + _)

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
