package graft.dedup

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter over word k-grams — the memory-bounded
  * membership structure behind [[Dedup.bloomDecontaminate]].
  *
  * Hashing is double hashing (Kirsch–Mitzenmacher 2006: position_i =
  * (h1 + i·h2) mod m reproduces the false-positive behavior of i
  * independent hashes) over the md5 of the gram text: h1 is the first
  * 15 hex chars, h2 the next 15 — the same md5-prefix discipline as
  * every other hash in this library, and the property that lets a
  * DuckDB oracle replay the filter BIT-FOR-BIT (false positives
  * included): `('0x' || substr(md5(g), 1, 15))::BIGINT` etc. Both
  * h1, h2 < 2⁶⁰, so h1 + i·h2 stays inside int64 for i ≤ 6 — kHashes
  * is capped at 7 rather than risking an engine-divergent wrap.
  */
object BloomMath {

  val MaxHashes = 7

  /** (h1, h2) packed as a 2-array, from one md5 of the gram text. */
  private def h1h2(gram: UTF8String): (Long, Long) = {
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(gram.getBytes)
    (java.lang.Long.parseLong(hex.substring(0, 15), 16),
      java.lang.Long.parseLong(hex.substring(15, 30), 16))
  }

  /** The kHashes bit positions of one gram (array<long>, each < mBits). */
  def positions(gram: UTF8String, kHashes: Int, mBits: Int): ArrayData = {
    val (h1, h2) = h1h2(gram)
    val out = new Array[Any](kHashes)
    var i = 0
    while (i < kHashes) { out(i) = (h1 + i * h2) % mBits; i += 1 }
    new GenericArrayData(out)
  }

  /** How many of one gram's kHashes positions are set in `bitmap` —
    * membership is hits == kHashes (count, not boolean, so the probe
    * can also report near-misses if a caller ever wants them).
    */
  def hits(bitmap: Array[Byte], gram: UTF8String, kHashes: Int, mBits: Int): Int = {
    val (h1, h2) = h1h2(gram)
    var n = 0
    var i = 0
    while (i < kHashes) {
      val p = (h1 + i * h2) % mBits
      if ((bitmap((p >>> 3).toInt) & (1 << (p & 7).toInt)) != 0) n += 1
      i += 1
    }
    n
  }
}

/** `bloom_positions(gram, kHashes, mBits) -> array<long>` — the build
  * side's per-gram bit positions as a codegen'd kernel
  * ([[BloomMath.positions]]).
  */
case class BloomPositionsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING gram, got ${first.dataType.catalogString}")
    else if (second.dataType != IntegerType || !second.foldable ||
        third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires literal INT kHashes and mBits")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(gram: Any, k: Any, m: Any): Any =
    BloomMath.positions(gram.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (g, k, m) => s"graft.dedup.BloomMath.positions($g, $k, $m)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomPositionsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "bloom_positions"
}

/** `bloom_hits(gram) -> int` against a plan-embedded bitmap — the probe
  * side's per-gram set-bit count ([[BloomMath.hits]]). The bitmap rides
  * as a codegen reference object (mBits/8 bytes shipped once per task
  * with the plan, like any broadcast literal), NOT as a join side — the
  * whole point of the operator is that the probe plan has no join.
  */
case class BloomHitsExpr(child: Expression, kHashes: Int, mBits: Int,
    bitmap: Array[Byte]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING gram, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(gram: Any): Any =
    BloomMath.hits(bitmap, gram.asInstanceOf[UTF8String], kHashes, mBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBitmap", bitmap, "byte[]")
    defineCodeGen(ctx, ev, g =>
      s"graft.dedup.BloomMath.hits($ref, $g, $kHashes, $mBits)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomHitsExpr =
    copy(child = newChild)
  override def prettyName: String = "bloom_hits"
}

/** OR-fold of bit positions into one mBits-wide bitmap — a typed
  * `Aggregator`, so the build is map-side-combining: every partition
  * folds its positions into a local mBits/8-byte buffer and the merge
  * ORs W buffers, one fixed-size row through the final exchange no
  * matter how many grams the benchmark holds. Associative, commutative,
  * idempotent (OR), so the result is identical under any partitioning
  * or AQE re-plan.
  */
class BloomOrAggregator(mBits: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(mBits >= 8 && mBits % 8 == 0, s"mBits must be a positive multiple of 8, got $mBits")

  override def zero: Array[Byte] = new Array[Byte](mBits / 8)

  override def reduce(buf: Array[Byte], p: Long): Array[Byte] = {
    buf((p >>> 3).toInt) = (buf((p >>> 3).toInt) | (1 << (p & 7).toInt)).toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}
