package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization expressions (OPTIMIZATION r17).
  *
  * The composed forms in [[graft.ext.Similarity]] — `transform` /
  * `zip_with` / `aggregate` chains — are CodegenFallback: every corpus
  * row paid m×ksub×dsub interpreted lambda dispatches plus a struct
  * allocation per candidate code, and the HOF broke the surrounding
  * WholeStageCodegen span. Each expression here runs the same
  * arithmetic in one JVM loop.
  *
  * Value parity with the composed forms is EXACT, pinned by
  * QuantizeSpec and the PQ oracle rows (q97/q98/q99/q104/q107/q111):
  *  - accumulation is left-to-right in double, the order
  *    `aggregate`'s sequential fold uses;
  *  - per-distance rounding replicates Spark `round(x, 4)` on double:
  *    NaN/Infinity pass through, else
  *    `BigDecimal.valueOf(x).setScale(4, HALF_UP)`;
  *  - the argmin replicates `array_min` over `struct(dist, code)`:
  *    doubles compare NaN-safely (NaN largest, ±0.0 equal — Spark's
  *    ordering), a NULL dist sorts FIRST (nulls-first struct order,
  *    the zip_with-pads-with-null edge when a codebook entry's length
  *    mismatches), ties break toward the smaller code;
  *  - a null vector/codebook input yields null, like the HOFs.
  */

private[functions] object PqOps {
  /** Spark `round(x, 4)` on DoubleType, exactly. */
  def round4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's double ordering: NaN == NaN, NaN > everything,
    * -0.0 == 0.0. */
  def cmp(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if (xn && yn) 0
    else if (xn) 1
    else if (yn) -1
    else if (x == y) 0
    else if (x < y) -1
    else 1
  }

  /** Rounded L2 distance between `v[off, off+dsub)` and `cent`, or
    * null (boxed) when lengths mismatch or any element is null — the
    * zip_with/aggregate null semantics. */
  private def dist2(v: ArrayData, off: Int, dsub: Int,
      cent: ArrayData): java.lang.Double = {
    if (cent.numElements() != dsub) return null
    var acc = 0.0
    var t = 0
    while (t < dsub) {
      if (v.isNullAt(off + t) || cent.isNullAt(t)) return null
      val d = v.getDouble(off + t) - cent.getDouble(t)
      acc += d * d
      t += 1
    }
    round4(acc)
  }

  /** PQ codes of `v` against packed codebooks `cb` (entry j*ksub+c =
    * subspace j's code-c centroid). */
  def encode(v: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dsub = v.numElements() / m
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      var bestCode = -1
      var bestNull = false
      var bestDist = 0.0
      var c = 0
      while (c < ksub) {
        val d = dist2(v, j * dsub, dsub, cb.getArray(j * ksub + c))
        val better =
          if (bestCode < 0) true
          else if (d == null) !bestNull // null dist sorts first
          else if (bestNull) false
          else cmp(d.doubleValue(), bestDist) < 0
        if (better) {
          bestCode = c
          bestNull = d == null
          bestDist = if (d == null) 0.0 else d.doubleValue()
        }
        c += 1
      }
      out(j) = bestCode
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The probe's m×ksub ADC lookup table: entry j*ksub+c = rounded dot
    * of probe subvector j with codebook entry (j, c); null entries on
    * length mismatch / null elements (zip_with semantics). */
  def lut(v: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dsub = v.numElements() / m
    val out = new Array[Any](m * ksub)
    var i = 0
    while (i < m * ksub) {
      val j = i / ksub
      val cent = cb.getArray(i)
      out(i) =
        if (cent.numElements() != dsub) null
        else {
          var acc = 0.0
          var t = 0
          var isNull = false
          while (t < dsub && !isNull) {
            if (v.isNullAt(j * dsub + t) || cent.isNullAt(t)) isNull = true
            else { acc += v.getDouble(j * dsub + t) * cent.getDouble(t); t += 1 }
          }
          if (isNull) null else java.lang.Double.valueOf(round4(acc))
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sum of the `lut` entries selected by `codes` — null if any
    * selected entry or code is null (the aggregate-fold semantics). */
  def adc(lut: ArrayData, codes: ArrayData, m: Int,
      ksub: Int): java.lang.Double = {
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val idx = j * ksub + codes.getInt(j)
      if (idx < 0 || idx >= lut.numElements() || lut.isNullAt(idx))
        return null
      acc += lut.getDouble(idx)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** Shared shape checks for the PQ expressions. */
private[functions] trait PqShape { self: BinaryExpression =>
  def m: Int
  def ksub: Int
  def vecChild: Expression
  def cbChild: Expression

  protected def checkShapes(pretty: String): TypeCheckResult = {
    val vecOk = vecChild.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = cbChild.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (!vecOk || !cbOk) TypeCheckResult.TypeCheckFailure(
      s"$pretty requires (array<double>, array<array<double>>), got " +
        s"${vecChild.dataType.catalogString} and ${cbChild.dataType.catalogString}")
    else if (m <= 0 || ksub <= 0) TypeCheckResult.TypeCheckFailure(
      s"$pretty requires m > 0 and ksub > 0, got m=$m ksub=$ksub")
    else TypeCheckResult.TypeCheckSuccess
  }
}

case class PqEncodeExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression with PqShape {
  override def vecChild: Expression = left
  override def cbChild: Expression = right
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult = checkShapes(prettyName)

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.functions.PqOps$$.MODULE$$.encode($v, $cb, $m, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

case class PqLutExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression with PqShape {
  override def vecChild: Expression = left
  override def cbChild: Expression = right
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "pq_lut"
  override def checkInputDataTypes(): TypeCheckResult = checkShapes(prettyName)

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqOps.lut(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.functions.PqOps$$.MODULE$$.lut($v, $cb, $m, $ksub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqLutExpr =
    copy(left = newLeft, right = newRight)
}

/** ADC score: sum of LUT entries selected by the row's codes. Null on
  * null inputs, null codes, or out-of-range/null LUT entries. */
case class PqAdcExpr(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (!lutOk || !codesOk) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    else if (m <= 0 || ksub <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires m > 0 and ksub > 0, got m=$m ksub=$ksub")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullable: Boolean = true

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqOps.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      m, ksub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.freshName("adc")
    nullSafeCodeGen(ctx, ev, (lut, codes) => s"""
      java.lang.Double $d = graft.functions.PqOps$$.MODULE$$.adc($lut, $codes, $m, $ksub);
      if ($d == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $d.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
