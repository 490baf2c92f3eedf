package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index (Hilbert 1891; the xy2d bit transform of Warren's
  * Hacker's Delight / the Wikipedia formulation): maps a (x, y) cell of the
  * 2^bits × 2^bits grid to its position along the space-filling Hilbert
  * curve. The layout companion to [[graft.ext.Layout.zValue]]'s Morton
  * interleave: both give one sort key whose contiguous ranges are small
  * rectangles in BOTH dimensions, but the Hilbert curve never takes the
  * Morton curve's long diagonal jumps, so equal-size key ranges have
  * strictly better worst-case locality (smaller max side ratio) — the
  * reason modern table formats offer hilbert-clustering beside z-order.
  *
  * The transform is an iterative quadrant rotation (`bits` rounds of pure
  * integer ops), which as a composed Column expression would duplicate the
  * x/y subtrees ~3× per round (3^bits-node trees — the q118 lesson at the
  * integer scale); as a kernel it is one O(bits) loop per row, map-side,
  * zero shuffles. The DuckDB oracle replays the SAME rounds as `bits`
  * unrolled integer CTE stages — every op is exact BIGINT arithmetic.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_index needs (bigint, bigint), got $other")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertKernel.xy2d(bits, x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKernel.xy2d($bits, $a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertIndex {
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}

object HilbertKernel {

  /** Position of grid cell (x, y) on the order-`bits` Hilbert curve.
    * Caller guarantees 0 ≤ x, y < 2^bits (the [[graft.ext.Layout.zValue]]
    * range contract). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // quadrant rotation
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x
        x = y
        y = t
      }
      s >>= 1
    }
    d
  }
}
