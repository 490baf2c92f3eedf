package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused PQ subquantizer-distance matrix: quantize the input vector with the
  * global int8 scale, then for each of the `m` subquantizers the squared-L2
  * distances to every codebook centroid — `array<array<long>>` (m × ksub) in
  * ONE codegen unit.
  *
  * Exists for the [[NearestCentroids]] reason taken to its limit: the
  * expression form of PQ encode/ADC unrolls m·ksub·subDim literal terms
  * (8·16·8 = 1024 for the defaults, on BOTH the code and LUT sides), and
  * Catalyst analysis/optimization over that ~50k-node tree cost ~8 s PER
  * EXECUTION — flat in data size, pure planning overhead (measured r12:
  * q143 8.1 s at 500 rows AND at 2000 rows). One opaque node plans in
  * milliseconds and the kernel runs the same integer arithmetic codegen'd.
  *
  * Arithmetic parity with the expression form it replaces (and the DuckDB
  * replay): quantization is x/safe under BigDecimal HALF_UP rounding at
  * scale 0, clamped to ±127; distances are exact integer sums in index
  * order.
  */
case class PqDistMatrix(child: Expression, codebook: Array[Array[Int]],
                        m: Int, safe: Double) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_pq_dist_matrix"

  override def nullSafeEval(v: Any): Any =
    PqDistMatrixKernel.compute(v.asInstanceOf[ArrayData], codebook, m, safe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "int[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqDistMatrixKernel.compute($c, $cbRef, $m, $safe);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // array fields break case-class equality; compare by value so Catalyst
  // attribute dedup still works
  override def equals(other: Any): Boolean = other match {
    case PqDistMatrix(c, cb, mm, s) =>
      c == child && mm == m && s == safe && cb.length == codebook.length &&
        cb.zip(codebook).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    ((child.hashCode() * 31 + codebook.length) * 31 + m) * 31 + safe.hashCode()
}

object PqDistMatrix {
  def pqDistMatrix(vec: Column, codebook: Array[Array[Int]], m: Int,
                   safe: Double): Column =
    ColumnBridge.column(PqDistMatrix(ColumnBridge.expression(vec), codebook, m, safe))
}

object PqDistMatrixKernel {

  /** int8-quantize with the global scale (BigDecimal HALF_UP, clamp ±127 —
    * the exact `least(greatest(round(x/safe),-127),127)` arithmetic), then
    * the m × ksub integer squared-L2 distance matrix. */
  def compute(v: ArrayData, codebook: Array[Array[Int]], m: Int,
              safe: Double): ArrayData = {
    val len = v.numElements()
    val q = new Array[Int](len)
    var d = 0
    while (d < len) {
      val r = java.math.BigDecimal.valueOf(v.getDouble(d) / safe)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      q(d) = math.min(math.max(r, -127.0), 127.0).toInt
      d += 1
    }
    val subDim = len / m
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val dists = new Array[Any](codebook.length)
      var j = 0
      while (j < codebook.length) {
        val cb = codebook(j)
        var acc = 0L
        var i = 0
        while (i < subDim) {
          val diff = (q(mi * subDim + i) - cb(mi * subDim + i)).toLong
          acc += diff * diff
          i += 1
        }
        dists(j) = acc
        j += 1
      }
      out(mi) = new GenericArrayData(dists)
      mi += 1
    }
    new GenericArrayData(out)
  }
}
