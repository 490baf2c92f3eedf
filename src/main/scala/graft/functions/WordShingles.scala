package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in ONE pass over the raw text — the fused
  * kernel behind [[graft.ext.Dedup.explodedShingles]] (q24/q55/q70 and the
  * decontamination operator).
  *
  * vs. the HOF formulation (`split` → `sequence` → `transform(concat_ws)` →
  * `array_distinct`): higher-order array functions evaluate their lambdas
  * INTERPRETED (no doGenCode), allocate an index array plus a full
  * pre-distinct shingle array per row, and array_distinct re-compares
  * UTF8Strings quadratically-ish through the generic equality — measured
  * 3.1 s of the 3.5 s q55 stage at sf0.1. The kernel tokenizes, builds each
  * shingle into one reused StringBuilder, and dedups through a LinkedHashSet
  * (first-occurrence order, matching array_distinct), emitting the array
  * directly. Null when the document has fewer than n tokens — under the
  * `explode` every consumer applies, identical to the old empty array.
  */
case class WordShingles(child: Expression, shingleN: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_shingles"

  override def nullSafeEval(v: Any): Any =
    WordShingleKernel.compute(v.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WordShingleKernel.compute($c, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordShingles {
  def wordShingles(text: Column, shingleN: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), shingleN))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object WordShingleKernel {

  /** Null when the text has fewer than shingleN tokens (the exploded
    * formulation emits no row either way). */
  def compute(text: UTF8String, shingleN: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < shingleN) return null
    val seen = new java.util.LinkedHashSet[String](tokens.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - shingleN) {
      sb.setLength(0)
      var t = 0
      while (t < shingleN) {
        if (t > 0) sb.append(' ')
        sb.append(tokens(i + t))
        t += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }
}
