package graft.text

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TRUE byte-pair-encoding tokenization (SURVEY.md §2.H, t14) — applies
  * a ranked merges table iteratively per pre-tokenizer piece, the way a
  * real model tokenizer does, rather than merely COUNTING pre-tokenizer
  * pieces (t05). The merge loop is classic BPE: while any adjacent
  * symbol pair appears in the merges table, merge every non-overlapping
  * occurrence of the best-ranked (lowest-rank) such pair, leftmost
  * first, then re-scan. Ranks are unique by construction, so there are
  * no merge-order ties to break.
  *
  * Scale shape: encoding is a pure narrow per-row map (a codegen'd
  * static call, the `WavMath` pattern — no UDF, no array HOFs), so a
  * 100 TB corpus tokenizes with ZERO shuffles before the final
  * (doc_id, token) aggregation; per-piece cost is O(len² · lookup) with
  * a tiny constant against the in-JVM merge map.
  *
  * The merges table here is a pinned fixture vocabulary (multi-level
  * chains over the corpus's own vocabulary plus frequent English
  * digrams); a production deployment would load a model's merges.txt
  * into the same structure. It is the SINGLE source of truth for both
  * engines: the Spark kernel reads the compiled map, and the DuckDB
  * oracle replays the identical list via [[mergesSqlValues]], with the
  * merge loop expressed as a recursive CTE over a separator-encoded
  * symbol string (each symbol carries its OWN boundary separators —
  * `\u001f a \u001f\u001f b \u001f` — so one SQL `replace` call is
  * exactly one leftmost non-overlapping merge-all pass).
  */
object Bpe {

  /** Ranked merges (rank = index). Chain families first (value, table,
    * scan, hash, row, part, merge, fast, spark — the corpus vocabulary)
    * so multi-level merging is exercised on real data, then frequent
    * English digrams and digit pairs.
    */
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("th", "e"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("h", "a"), ("ha", "s"), ("has", "h"),
    ("r", "o"), ("ro", "w"),
    ("p", "a"), ("pa", "r"), ("par", "t"),
    ("i", "n"), ("in", "g"),
    ("e", "r"), ("a", "n"), ("an", "d"), ("r", "e"), ("o", "n"),
    ("a", "t"), ("e", "n"), ("o", "r"), ("s", "t"), ("a", "r"),
    ("a", "l"), ("t", "o"), ("i", "s"), ("i", "t"), ("o", "u"),
    ("e", "s"), ("l", "e"), ("s", "e"),
    ("m", "e"), ("me", "r"), ("mer", "g"), ("merg", "e"),
    ("0", "0"), ("1", "0"), ("2", "0"),
    ("f", "a"), ("fa", "s"), ("fas", "t"),
    ("s", "p"), ("sp", "a"), ("spa", "r"), ("spar", "k"))

  private val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + "\u0000" + b, r) }
    m
  }

  /** token string → id: single characters are their code point; a
    * merged symbol is 256 + the MIN rank of a merge producing that
    * concatenation (min guards against two merges concatenating to the
    * same string; the fixture table has no such collision). −1 for a
    * multi-char string no merge produces (cannot occur on encoder
    * output).
    */
  private val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      val t = a + b
      if (!m.containsKey(t)) m.put(t, 256 + r)
    }
    m
  }

  def tokenId(tok: String): Int =
    if (tok.codePointCount(0, tok.length) == 1) tok.codePointAt(0)
    else Option(idOf.get(tok)).map(_.toInt).getOrElse(-1)

  /** The t05 pre-tokenizer: letter runs / digit runs / single
    * punctuation over the canonical (lowercased, space-collapsed) text.
    */
  private val PieceRe = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** BPE-encode one pre-tokenizer piece. Symbols are CODE POINTS, not
    * UTF-16 units — a supplementary character (emoji, rare CJK) must
    * stay one symbol, or its two surrogate halves become lone-surrogate
    * "tokens" that UTF8String encodes as `?` while the code-point-based
    * oracle (DuckDB `len`) keeps the character whole.
    */
  def encodePiece(piece: String): Array[String] = {
    val n = piece.codePointCount(0, piece.length)
    if (n <= 1) return Array(piece)
    var syms = new Array[String](n)
    var i = 0
    var off = 0
    while (off < piece.length) {
      val cc = Character.charCount(piece.codePointAt(off))
      syms(i) = piece.substring(off, off + cc)
      i += 1; off += cc
    }
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = rankOf.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == a && syms(k + 1) == b) {
            out += a + b; k += 2
          } else { out += syms(k); k += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** BPE tokens of a whole canonical document: pre-tokenize, encode
    * each piece, concatenate. Empty/blank input → empty array.
    */
  def encodeDoc(norm: UTF8String): ArrayData = {
    val s = norm.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](s.length / 3 + 1)
    val m = PieceRe.matcher(s)
    while (m.find()) {
      val toks = encodePiece(m.group())
      var i = 0
      while (i < toks.length) { out += UTF8String.fromString(toks(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  def tokenIdU(tok: UTF8String): Int = tokenId(tok.toString)

  /** The merges table as a SQL VALUES body `(rank, a, b), ...` — the
    * oracle-side mirror, generated from the same vector.
    */
  def mergesSqlValues: String =
    merges.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")
}

/** `bpe_tokens(string) -> array<string>` — whole-document true-BPE
  * tokenization as a native codegen'd expression over the canonical
  * text ([[Bpe.encodeDoc]]).
  */
case class BpeTokensExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeDoc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.encodeDoc($c)")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_tokens"
}

/** `bpe_token_id(string) -> int` — the vocabulary id of an encoder
  * output token ([[Bpe.tokenId]]): code point for single characters,
  * 256 + merge rank for merged symbols.
  */
case class BpeTokenIdExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    Bpe.tokenIdU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Bpe.tokenIdU($c)")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeTokenIdExpr =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_id"
}

/** Session registration for the BPE kernels (the `MediaFunctions`
  * pattern — idempotent, callable from any query path).
  */
object BpeFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_tokens"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokensExpr].getName, "bpe_tokens"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeTokensExpr(children.head))
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_token_id"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokenIdExpr].getName, "bpe_token_id"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeTokenIdExpr(children.head))
  }
}
