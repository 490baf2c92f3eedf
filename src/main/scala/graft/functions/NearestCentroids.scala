package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused IVF coarse-quantizer probe: the ids of the `n` centroids most
  * cosine-similar to the input vector, ordered by (rounded sim, id)
  * descending — one codegen unit instead of `nlist` separate dot-product
  * projections plus an array sort (the SignBuckets lesson: with 16+ literal
  * centroids per side, Janino compilation of the unrolled tree dominated
  * the ANN query).
  *
  * Arithmetic parity: reproduces exactly the expression form it replaces —
  * index-order dot products, `sqrt(dot(v,v))` norms, and Spark `round`'s
  * BigDecimal HALF_UP at scale 4 — so results are oracle-stable
  * (q43 hash-matches DuckDB either way).
  */
case class NearestCentroids(child: Expression, cents: Array[Array[Double]],
                            cids: Array[Long], n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroids"

  override def nullSafeEval(v: Any): Any =
    NearestCentroidsKernel.compute(v.asInstanceOf[ArrayData], cents, cids, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroidsKernel.compute($c, $centsRef, $cidsRef, $n);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // array fields break case-class equality; compare by value so Catalyst
  // attribute dedup still works
  override def equals(other: Any): Boolean = other match {
    case NearestCentroids(c, p, ids, m) =>
      c == child && m == n && java.util.Arrays.equals(ids, cids) &&
        p.length == cents.length &&
        p.zip(cents).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int =
    (child.hashCode() * 31 + cents.length) * 31 + n
}

object NearestCentroids {
  def nearestCentroids(vec: Column, cents: Seq[(Long, Array[Double])], n: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(vec),
      cents.map(_._2).toArray, cents.map(_._1).toArray, n))
}

object NearestCentroidsKernel {

  /** Rounded cosine sims against every centroid, then the top `n` centroid
    * ids by (sim, id) descending — selection sort over nlist entries (nlist
    * is small by construction; no allocation beyond the result). */
  def compute(v: ArrayData, cents: Array[Array[Double]], cids: Array[Long], n: Int): ArrayData = {
    val len = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < len) { val x = v.getDouble(i); vv += x * x; i += 1 }
    val vNorm = math.sqrt(vv)

    val sims = new Array[Double](cents.length)
    var p = 0
    while (p < cents.length) {
      val cv = cents(p)
      // centroid norm in the same index-order arithmetic as the expression
      // form (sum of squares left-to-right)
      var cc = 0.0
      var j = 0
      while (j < cv.length) { cc += cv(j) * cv(j); j += 1 }
      val cNorm = math.sqrt(cc)
      val m = math.min(len, cv.length)
      var acc = 0.0
      i = 0
      while (i < m) { acc += v.getDouble(i) * cv(i); i += 1 }
      val sim = acc / (vNorm * cNorm)
      sims(p) = java.math.BigDecimal.valueOf(sim)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      p += 1
    }

    val take = math.min(n, cents.length)
    val out = new Array[Any](take)
    val used = new Array[Boolean](cents.length)
    var r = 0
    while (r < take) {
      var best = -1
      p = 0
      while (p < cents.length) {
        if (!used(p) && (best < 0 || sims(p) > sims(best) ||
            (sims(p) == sims(best) && cids(p) > cids(best)))) best = p
        p += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}
