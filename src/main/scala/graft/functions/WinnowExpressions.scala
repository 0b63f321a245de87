package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.DetHash

/** Winnowing fingerprint set as a native expression.
  *
  * Same contract as the composed higher-order-function pipeline in
  * [[graft.ext.TextAnalysis]] (k-char grams → Rabin-Karp hash mod
  * [[DetHash.P]] → minimum per w-window → first-occurrence-distinct),
  * and bit-identical output: the composed form evaluates each gram's
  * polynomial from scratch (O(len·k) interpreted lambda calls — Spark
  * HOFs are CodegenFallback), while this expression uses the actual
  * ROLLING update h' = (h − c₀·Bᵏ⁻¹)·B + cₖ (O(len) total) in one JVM
  * loop invoked from generated code, keeping the surrounding
  * whole-stage-codegen span intact. Both reduce mod P at every step, so
  * the selected minima — and therefore the fingerprint set the oracle
  * SQL recomputes — are identical.
  *
  * Input contract: the string is already normalized to ASCII
  * ([a-z0-9], see the `regexp_replace` in the caller); gram codes are
  * the raw bytes, matching `ascii()` on single ASCII chars.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (k <= 0 || w <= 0) TypeCheckResult.TypeCheckFailure(
      // analysis-time failure, not ArrayIndexOutOfBounds from codegen
      s"$prettyName requires k > 0 and w > 0, got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints$$.MODULE$$.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val P = DetHash.P
  private val B = graft.ext.TextAnalysis.winnowBase

  /** O(len) winnow: rolling gram hashes, then window minima,
    * first-occurrence-distinct — the exact value set of the composed
    * HOF pipeline (every intermediate is reduced mod P). */
  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    // B^(k-1) mod P for the roll-off term
    var powK1 = 1L
    var p = 0
    while (p < k - 1) { powK1 = powK1 * B % P; p += 1 }
    val h = new Array[Long](m)
    var acc = 0L
    var j = 0
    while (j < k) {
      acc = (acc * B + (bytes(j) & 0xff)) % P
      j += 1
    }
    h(0) = acc
    var i = 1
    while (i < m) {
      val t = (h(i - 1) - (bytes(i - 1) & 0xff) * powK1 % P + P) % P
      h(i) = (t * B + (bytes(i + k - 1) & 0xff)) % P
      i += 1
    }
    val lastWin = math.max(m - w, 0)
    val seen = new java.util.HashSet[Long]()
    val out = new ArrayBuffer[Long]()
    var s0 = 0
    while (s0 <= lastWin) {
      var mn = h(s0)
      var q = s0 + 1
      val end = math.min(s0 + w, m)
      while (q < end) { if (h(q) < mn) mn = h(q); q += 1 }
      if (seen.add(mn)) out += mn
      s0 += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Per-position rolling gram-hash array (the winnow pipeline's `h`
  * stage without the window-minima selection) — the primitive
  * content-defined chunking cuts on ([[graft.ext.Curation.cdcChunks]]).
  * Same O(len) rolling update, same mod-[[DetHash.P]] reduction, same
  * ASCII input contract as [[WinnowFingerprints]], so the oracle SQL's
  * per-gram polynomial recomputes it bit-exactly. */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0, got k=$k")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramHashes$$.MODULE$$.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  private val P = DetHash.P
  private val B = graft.ext.TextAnalysis.winnowBase

  /** O(len) rolling hash per gram start position; empty for len < k. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    var powK1 = 1L
    var p = 0
    while (p < k - 1) { powK1 = powK1 * B % P; p += 1 }
    val h = new Array[Long](m)
    var acc = 0L
    var j = 0
    while (j < k) {
      acc = (acc * B + (bytes(j) & 0xff)) % P
      j += 1
    }
    h(0) = acc
    var i = 1
    while (i < m) {
      val t = (h(i - 1) - (bytes(i - 1) & 0xff) * powK1 % P + P) % P
      h(i) = (t * B + (bytes(i + k - 1) & 0xff)) % P
      i += 1
    }
    new GenericArrayData(h)
  }
}

/** Column-API entry point. */
object WinnowFunctions {
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    GraftColumnBridge.column(WinnowFingerprints(
      GraftColumnBridge.expression(text), k, w))

  def gramHashes(text: Column, k: Int = 8): Column =
    GraftColumnBridge.column(GramHashes(
      GraftColumnBridge.expression(text), k))
}
