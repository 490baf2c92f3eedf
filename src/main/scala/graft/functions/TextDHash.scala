package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional difference-hash of a text column — the dHash construction
  * (Krawetz's classic image fingerprint) applied to a character stream:
  * split the text's code points into 64 balanced segments, sum each
  * segment's code-point values, and emit 63 bits where bit i = 1 iff
  * segment i's sum exceeds segment i+1's. Two texts that differ in a few
  * characters differ in a few segment sums, hence in a few bits — a
  * LOCALITY-SENSITIVE 63-bit fingerprint whose Hamming distance is a
  * structural (position-aware) near-dup signal, complementary to
  * SimHash's bag-of-words signal (q23) and MinHash's set signal (q21):
  * it is the text twin of [[graft.ext.Multimodal.imageDHash]], sharing
  * the exact 64-cell/63-diff bit rule so downstream Hamming machinery
  * ([[graft.ext.Dedup.hammingNearDup]]) is modality-agnostic.
  *
  * 63 bits, not 64, so the hash stays non-negative in any engine's
  * signed 64-bit integer — shifts and band masks never touch the sign
  * bit. Arithmetic is exact integers end to end; the DuckDB replay is
  * unicode(substring(text, p, 1)) sums over the same balanced-segment
  * rule seg(p) = ((p−1)·64) div L. Segments beyond a short text's length
  * sum to zero (the kernel's zero-initialized cells; the oracle's
  * COALESCE over the dense 64-segment grid).
  *
  * Map-side kernel (the [[BpeEncode]] pattern): one pass over the code
  * points per document, zero shuffles.
  */
case class TextDHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_text_dhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_text_dhash needs string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    TextDHashKernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextDHashKernel.compute($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextDHash {
  def textDHash(text: Column): Column =
    ColumnBridge.column(TextDHash(ColumnBridge.expression(text)))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object TextDHashKernel {

  /** Shared 64-cell → 63-bit rule (also the image path's bit packer):
    * bit i = 1 iff cells(i) > cells(i+1), i = 0..62. */
  def packBits(cells: Array[Long]): Long = {
    var h = 0L
    var i = 0
    while (i < 63) {
      if (cells(i) > cells(i + 1)) h |= (1L << i)
      i += 1
    }
    h
  }

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val L = s.codePointCount(0, s.length)
    if (L == 0) return 0L
    val cells = new Array[Long](64)
    var i = 0 // UTF-16 index
    var p = 0 // code-point index
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cells(((p.toLong * 64) / L).toInt) += cp
      i += Character.charCount(cp)
      p += 1
    }
    packBits(cells)
  }
}
