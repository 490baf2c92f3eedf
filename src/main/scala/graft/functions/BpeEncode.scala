package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer ENCODE (the apply side of [[graft.ext.Bpe.learnMerges]]):
  * per document, whitespace-split into words, expand each word into
  * code-point symbols plus the end-of-word sentinel ([[graft.ext.Bpe
  * .Sentinel]]), then apply the learned merge table IN ROUND ORDER, each
  * round greedily left-to-right and non-overlapping — exactly the
  * application rule merge learning itself used, so encoding a corpus with
  * its own learned table reproduces the trainer's final symbol streams
  * (Sennrich ACL '16 `apply_bpe`). Returns the document's token stream.
  *
  * Encoding is DOCUMENT-LOCAL, so the whole loop belongs in a map-side
  * kernel (the [[WinnowFingerprints]] pattern): the equivalent relational
  * spelling — explode to (word, pos, sym) rows and run R rounds of
  * pair-mark → gaps-and-islands → rebuild windows — shuffles every symbol
  * row R times, a plan shape that is pure window latency at any scale.
  * The merge table rides into codegen as a reference object (it is
  * vocabulary-sized — bounded by the learner's `rounds`), so the encode
  * is one scan-stage call per document: zero shuffles, zero state.
  *
  * The DuckDB oracle replays the relational spelling over the DISTINCT
  * word types (encode is word-local, so per-type work + a join back is
  * the same answer) — equality of the two formulations is pinned in
  * BpeSpec on top of the corpus-level CORRECTNESS gate.
  *
  * Greedy one-pass correctness: after fusing (a,b)→ab at position i, the
  * stream element at i is `ab`, which can never equal `a` again (strictly
  * longer), so a plain left-to-right scan that skips the consumed right
  * element IS the non-overlapping greedy application ('aaa' under (a,a)
  * → ['aa','a'], 'aaaa' → ['aa','aa']).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val mergesArr: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b) }.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_encode needs string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    BpeApplyKernel.compute(v.asInstanceOf[UTF8String], mergesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.BpeApplyKernel.compute($c, $ref);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BpeEncode {
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object BpeApplyKernel {

  /** Tokens of the whole document, word-major then position order. Empty
    * words (consecutive spaces) contribute nothing — the same `word <> ''`
    * filter merge learning applies. Cost is O(rounds · doc-length) with
    * word-length bounded inner passes. */
  def compute(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (!w.isEmpty) {
        // code-point symbols + end-of-word sentinel (graft.ext.Bpe.Sentinel)
        var syms = new java.util.ArrayList[String](w.length + 1)
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          syms.add(new String(Character.toChars(cp)))
          i += Character.charCount(cp)
        }
        syms.add(" ")
        var r = 0
        while (r < merges.length) {
          val a = merges(r)(0)
          val b = merges(r)(1)
          val merged = a + b
          val next = new java.util.ArrayList[String](syms.size)
          var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms.get(j) == a && syms.get(j + 1) == b) {
              next.add(merged); j += 2
            } else { next.add(syms.get(j)); j += 1 }
          }
          syms = next
          r += 1
        }
        var t = 0
        while (t < syms.size) { out.add(UTF8String.fromString(syms.get(t))); t += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
