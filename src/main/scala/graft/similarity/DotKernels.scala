package graft.similarity

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Per-pair dot/norm math as narrow codegen kernels — the hot loop of
  * every exact-cosine re-verify (d05/s06 candidate verification, brute
  * baselines, SQ8 rescoring). The previous spelling — `zip_with` +
  * `aggregate` array HOFs — is CodegenFallback (interpreted) and
  * JIT-profile-sensitive (SURVEY note 3); these kernels run the same
  * arithmetic as plain JVM loops inside whole-stage codegen.
  *
  * Exactness discipline (must replay bit-for-bit in DuckDB): the EXACT
  * kernels replicate Spark's own `(x·y).cast(decimal(28,12))` per
  * element — `BigDecimal.valueOf(product)` is the shortest-decimal-repr
  * conversion Spark's double→decimal cast uses, `setScale(12, HALF_UP)`
  * its precision change — then sum (decimal addition is associative and
  * exact, so the fold order cannot matter) and convert once to double,
  * exactly like `Decimal.toDouble`. The FAST kernel folds plain doubles
  * left-to-right — the same order the `aggregate` HOF used, so even its
  * rounding is bit-identical.
  */
object DotMath {
  import java.math.{BigDecimal => JBD, RoundingMode}

  private def widen(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Exact decimal-accumulated dot product; null boxed (length mismatch
    * mirrors the HOF's null result).
    */
  def dotExact(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = JBD.ZERO
    var i = 0
    while (i < n) {
      val p = widen(a, i, aFloat) * widen(b, i, bFloat)
      acc = acc.add(JBD.valueOf(p).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }

  /** Plain-double left fold — the conservative prefilter dot. */
  def dotFast(a: ArrayData, b: ArrayData,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += widen(a, i, aFloat) * widen(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Exact decimal-accumulated squared L2 norm. */
  def normSqExact(a: ArrayData, aFloat: Boolean): Double = {
    val n = a.numElements()
    var acc = JBD.ZERO
    var i = 0
    while (i < n) {
      val v = widen(a, i, aFloat)
      acc = acc.add(JBD.valueOf(v * v).setScale(12, RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }
}

private[similarity] trait VecPairExpr { self: BinaryExpression =>
  protected def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }
  protected lazy val leftFloat: Boolean = elemOf(left.dataType).contains(FloatType)
  protected lazy val rightFloat: Boolean = elemOf(right.dataType).contains(FloatType)
  protected def checkVecInputs(name: String): TypeCheckResult =
    if (elemOf(left.dataType).isEmpty || elemOf(right.dataType).isEmpty)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires two ARRAY<DOUBLE|FLOAT> vectors, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
}

/** `dot_exact(vec, vec) -> double` ([[DotMath.dotExact]]). */
case class DotExactExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends BinaryExpression with VecPairExpr {
  override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotMath.dotExact(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
         java.lang.Double r = graft.similarity.DotMath.dotExact($a, $b, $leftFloat, $rightFloat);
         if (r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = r.doubleValue(); }
       """)
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): DotExactExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_exact"
}

/** `dot_fast(vec, vec) -> double` ([[DotMath.dotFast]]). */
case class DotFastExpr(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
    extends BinaryExpression with VecPairExpr {
  override def checkInputDataTypes(): TypeCheckResult = checkVecInputs(prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotMath.dotFast(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
         java.lang.Double r = graft.similarity.DotMath.dotFast($a, $b, $leftFloat, $rightFloat);
         if (r == null) { ${ev.isNull} = true; }
         else { ${ev.value} = r.doubleValue(); }
       """)
  override protected def withNewChildrenInternal(
      l: org.apache.spark.sql.catalyst.expressions.Expression,
      r: org.apache.spark.sql.catalyst.expressions.Expression): DotFastExpr =
    copy(left = l, right = r)
  override def prettyName: String = "dot_fast"
}

/** `norm_sq_exact(vec) -> double` ([[DotMath.normSqExact]]). */
case class NormSqExactExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends UnaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<DOUBLE|FLOAT> vector, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    DotMath.normSqExact(a.asInstanceOf[ArrayData], floatInput)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.similarity.DotMath.normSqExact($a, $floatInput)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): NormSqExactExpr =
    copy(child = c)
  override def prettyName: String = "norm_sq_exact"
}
