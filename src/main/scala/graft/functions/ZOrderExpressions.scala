package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native z-order expressions (OPTIMIZATION r17, guide §1.2/§7.2).
  *
  * The composed forms they replace were PLANNING hazards, not
  * execution ones: [[graft.lake.Maintenance.quantileBucket]]'s
  * balanced `when` tree is ~5 Catalyst nodes per cell (256 cells →
  * ~2.5k nodes per dimension), and
  * [[graft.lake.Maintenance.mortonKeyN]] re-embeds each dimension's
  * whole subtree once per interleaved bit — a 2-dim 8-bit clustered
  * OPTIMIZE carried a ~40k-node sort key that Catalyst re-walked on
  * every rule of every (re-)planning pass, including each AQE stage
  * re-optimization: measured ~4 s of RUNNABLE driver time per
  * clustered rewrite at sf0.1 against ~1.7 s of actual job time.
  * These expressions hold the cuts as plain JVM arrays and reference
  * each child exactly once, so the same key is O(dims) nodes; eval
  * and codegen both binary-search / interleave in one JVM helper,
  * value-identical to the composed forms (MaintenanceSpec pins the
  * equivalence, including the NaN falls-past-every-cut and
  * null-lands-in-bucket-0 edges).
  */

/** Rank bucket of a DOUBLE value among sorted, duplicate-free `cuts`:
  * the number of cuts at or below the value — `lower_bound` by Java
  * `<` semantics, so NaN (never `<` anything) lands past every cut,
  * exactly like the comparison tree it replaces. NULL input → bucket
  * 0 (nulls sort first), so the expression itself is never null. */
case class RankBucketDouble(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "rank_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.catalogString}")
    else if (cuts.isEmpty) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires at least one cut")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else ZOrderOps.searchDouble(v.asInstanceOf[Double], cuts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.ZOrderOps.searchDouble(${c.value}, $cutsRef);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucketDouble =
    copy(child = newChild)
}

/** [[RankBucketDouble]] for STRING dimensions — binary UTF8
  * comparison, the same ordering Spark's `<` on strings uses. */
case class RankBucketString(child: Expression, cuts: Array[UTF8String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "rank_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (cuts.isEmpty) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires at least one cut")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else ZOrderOps.searchString(v.asInstanceOf[UTF8String], cuts)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cutsRef = ctx.addReferenceObj("cuts", cuts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    ev.copy(code = code"""
      ${c.code}
      long ${ev.value} = 0L;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.ZOrderOps.searchString(${c.value}, $cutsRef);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucketString =
    copy(child = newChild)
}

/** N-dim Morton interleave over LONG children, each referenced ONCE:
  * bit i of dimension j lands at position `i*N + (N-1-j)` — the exact
  * [[graft.lake.Maintenance.mortonKeyN]] placement. Null if any
  * dimension is null (like the bitwise-OR fold it replaces). */
case class ZInterleave(children: Seq[Expression], bits: Int)
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "z_interleave"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2) TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs at least two dimensions")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: n*bits must be in [1,63], got ${children.size}*$bits")
    else children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires long dimensions, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Long]
      j += 1
    }
    ZOrderOps.interleave(vals, bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size
    val vals = ctx.freshName("zvals")
    val anyNull = ctx.freshName("zAnyNull")
    val childCodes = children.zipWithIndex.map { case (c, j) =>
      val cc = c.genCode(ctx)
      s"""
      ${cc.code}
      if (${cc.isNull}) { $anyNull = true; } else { $vals[$j] = ${cc.value}; }"""
    }.mkString("\n")
    ev.copy(code = code"""
      boolean $anyNull = false;
      long[] $vals = new long[$n];
      $childCodes
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!$anyNull) {
        ${ev.value} = graft.functions.ZOrderOps.interleave($vals, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZInterleave =
    copy(children = newChildren)
}

/** The shared eval/codegen helpers — one JVM call per row keeps the
  * surrounding whole-stage-codegen span intact (the Winnow pattern). */
object ZOrderOps {
  /** `lower_bound` by Java `<`: index of the first cut strictly
    * greater than `v` (NaN compares false, falling past every cut). */
  def searchDouble(v: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v < cuts(mid)) hi = mid else lo = mid + 1
    }
    lo.toLong
  }

  def searchString(v: UTF8String, cuts: Array[UTF8String]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v.compareTo(cuts(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo.toLong
  }

  /** Bit i of dimension j → position `i*n + (n-1-j)`, n = vals.length. */
  def interleave(vals: Array[Long], bits: Int): Long = {
    val n = vals.length
    var acc = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < n) {
        acc |= ((vals(j) >> i) & 1L) << (i * n + (n - 1 - j))
        j += 1
      }
      i += 1
    }
    acc
  }
}
