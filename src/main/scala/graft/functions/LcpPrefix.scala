package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-prefix length (in CODE POINTS) of two strings — the
  * adjacent-suffix comparator of the k-order suffix array
  * ([[graft.ext.SuffixArray]]): lcp of rank-adjacent suffixes bounds the
  * lcp of every suffix pair between them, so this one kernel prices all
  * repeated-substring structure.
  *
  * No built-in expresses this without an O(k²) HOF ladder (k substring
  * re-comparisons per pair, interpreted) — the SURVEY §4 custom-Expression
  * tier. The kernel walks the shared byte prefix once and counts only
  * COMPLETE code points inside it (a divergence mid-multibyte-sequence
  * cannot add a code point), so the result is exactly DuckDB's
  * "max i with equal i-char prefixes" replay.
  */
case class LcpPrefix(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcp"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcpPrefixKernel.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.LcpPrefixKernel.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcpPrefix {
  /** Column API: code-point LCP length of two string columns. */
  def lcp(a: Column, b: Column): Column =
    ColumnBridge.column(
      LcpPrefix(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object LcpPrefixKernel {
  def compute(a: UTF8String, b: UTF8String): Int = {
    val na = a.numBytes
    val nb = b.numBytes
    val n = math.min(na, nb)
    var m = 0
    while (m < n && a.getByte(m) == b.getByte(m)) m += 1
    // count complete code points inside the shared byte prefix
    var cp = 0
    var i = 0
    while (i < m) {
      val len = UTF8String.numBytesForFirstByte(a.getByte(i))
      if (i + len > m) return cp
      cp += 1
      i += len
    }
    cp
  }
}
