package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Fused sign-LSH bucket id: bit p of the result = (v · planes(p)) > 0, all
  * planes in one pass. One expression (one codegen unit) instead of P
  * separate dot-product projections — with 8+ planes per side the Janino
  * compilation cost of separate expressions dominated the ANN query.
  */
case class SignBuckets(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sign_buckets"

  override def nullSafeEval(v: Any): Any =
    SignBucketsKernel.compute(v.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBucketsKernel.compute($c, $planesRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)

  // Array fields break case-class equality; compare planes by value so
  // Catalyst attribute dedup still works.
  override def equals(other: Any): Boolean = other match {
    case SignBuckets(c, p) =>
      c == child && p.length == planes.length &&
        p.zip(planes).forall { case (a, b) => java.util.Arrays.equals(a, b) }
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + planes.length
}

object SignBuckets {
  def signBuckets(vec: Column, planes: Seq[Array[Double]]): Column =
    ColumnBridge.column(SignBuckets(ColumnBridge.expression(vec), planes.toArray))
}

object SignBucketsKernel {
  def compute(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getDouble(i) * plane(i)
        i += 1
      }
      if (acc > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }
}
