package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer ENCODE (the apply side of
  * [[graft.ext.Unigram.learn]]): per document, whitespace-split into
  * words; each word of length ≤ `wordLenCap` is segmented by the SAME
  * per-(n, j) Viterbi the trainer used (score DESC, path ASC in UTF-8
  * order — [[graft.ext.Unigram.viterbi]], shared code so the two can
  * never drift); longer words fall back to character-wise pieces (the
  * documented trainer length cap). Returns the document's piece stream,
  * word-major.
  *
  * Encoding is DOCUMENT-LOCAL, so the whole DP belongs in a map-side
  * kernel (the [[BpeEncode]] pattern): the relational spelling — explode
  * to (word, position) rows and run `wordLenCap` levels of join +
  * per-cell argmin — shuffles every candidate row per level, pure window
  * latency at any scale. The vocabulary rides into codegen as a bounded
  * reference object (it is vocab-budget-sized by the trainer's
  * construction).
  *
  * A per-task MEMO rides along as a second reference object: word →
  * pieces, because a corpus re-encodes each TYPE once per occurrence and
  * the type table is Heaps-bounded (the corpus' whole point) — the DP
  * then runs once per distinct word per task, and every further
  * occurrence is a hash hit. The memo deserializes EMPTY into each task
  * (reference objects are per-task copies), so state never crosses task
  * or query boundaries.
  *
  * The DuckDB oracle replays the relational spelling over the DISTINCT
  * word types + a join back (encode is word-local) — the level tables
  * keep one row per (word, pieces-used, end) with the identical
  * tie-break, so kernel and oracle agree bit-for-bit.
  */
case class UnigramEncode(child: Expression, pieces: Seq[(String, Double)],
                         maxPieceLen: Int, wordLenCap: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_encode"

  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, pr) => m.put(p, java.lang.Double.valueOf(pr)) }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_unigram_encode needs string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    UnigramEncodeKernel.compute(v.asInstanceOf[UTF8String], vocabMap, memo,
      maxPieceLen, wordLenCap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vref = ctx.addReferenceObj("uniVocab", vocabMap, "java.util.HashMap")
    val mref = ctx.addReferenceObj("uniMemo", memo,
      "java.util.concurrent.ConcurrentHashMap")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.UnigramEncodeKernel.compute(
         |  $c, $vref, $mref, $maxPieceLen, $wordLenCap);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object UnigramEncode {
  def unigramEncode(text: Column, pieces: Seq[(String, Double)],
                    maxPieceLen: Int = 4, wordLenCap: Int = 16): Column =
    ColumnBridge.column(
      UnigramEncode(ColumnBridge.expression(text), pieces, maxPieceLen, wordLenCap))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object UnigramEncodeKernel {

  /** Per-task memo entry cap — bounds executor memory against adversarial
    * type inventories (1M entries ≈ tens of MB; real Heaps-law vocabularies
    * sit far below it). */
  final val MemoCap = 1 << 20

  /** Pieces of the whole document, word-major. Empty words (consecutive
    * spaces) contribute nothing — the same `word <> ''` filter the
    * trainer applies. */
  def compute(text: UTF8String,
              vocab: java.util.HashMap[String, java.lang.Double],
              memo: java.util.concurrent.ConcurrentHashMap[String, Array[String]],
              maxPieceLen: Int, wordLenCap: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val out = new java.util.ArrayList[Any]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (!w.isEmpty) {
        var ps = memo.get(w)
        if (ps == null) {
          val syms = graft.ext.Bpe.codePointSymbols(w)
          ps =
            if (syms.length > wordLenCap) syms.toArray // documented fallback
            else graft.ext.Unigram.viterbi(syms, vocab.get(_), maxPieceLen).toArray
          // The Heaps bound on word TYPES is corpus-level; a single
          // long-lived task over high-entropy text (URLs, hashes) could
          // grow the memo without limit. Cap insertions — past MemoCap the
          // DP just reruns (cheap for the rare words that blow the cap).
          if (memo.size < MemoCap) memo.put(w, ps)
        }
        var t = 0
        while (t < ps.length) { out.add(UTF8String.fromString(ps(t))); t += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}
