package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole text-quality/language profile in ONE pass (q27/q29 and the
  * q42/q53 scoring stage): token count, mean token length, non-alpha
  * ratio, stopword ratio, composite quality, per-language marker scores,
  * and the argmax language — replacing a stack of `filter(isin)` HOFs
  * (interpreted lambdas, one pass over the token array PER ratio) plus
  * regex length arithmetic.
  *
  * Every double is computed in the exact operation order of the expression
  * form ([[graft.ext.TextOps]] — which remains the SQL-mirrored spec), so
  * results are bit-identical and the DuckDB oracles are untouched; the
  * ExtSpec equivalence test pins this.
  */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = TextStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_text_stats"

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(v: Any): Any =
    TextStatsKernel.compute(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextStatsKernel.compute($c, $setRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {
  /** Field order is part of the contract — consumers select by name. */
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_tok_len", DoubleType, nullable = false),
    StructField("nonalpha_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false),
    StructField("s_en", DoubleType, nullable = false),
    StructField("s_es", DoubleType, nullable = false),
    StructField("s_de", DoubleType, nullable = false),
    StructField("lang_pred", StringType, nullable = false)))

  def textStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text), stopwords))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). Marker lists mirror [[graft.ext.TextOps.LangMarkers]]. */
object TextStatsKernel {

  private val En = toSet(Seq("the", "a", "or", "and", "fast", "slow"))
  private val Es = toSet(Seq("el", "la", "los", "datos", "y"))
  private val De = toSet(Seq("der", "die", "das", "und", "nicht"))
  private def toSet(ws: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    ws.foreach(s.add)
    s
  }

  def compute(text: UTF8String, stopSet: java.util.HashSet[String]): InternalRow = {
    val str = text.toString
    val len = str.length
    var nonAlpha = 0
    var i = 0
    while (i < len) {
      val ch = str.charAt(i)
      if (!(ch == ' ' || (ch >= 'a' && ch <= 'z'))) nonAlpha += 1
      i += 1
    }
    val toks = str.split(" ", -1)
    val nt = toks.length
    var stop = 0
    var en = 0
    var es = 0
    var de = 0
    i = 0
    while (i < nt) {
      val t = toks(i)
      if (stopSet.contains(t)) stop += 1
      if (En.contains(t)) en += 1
      if (Es.contains(t)) es += 1
      if (De.contains(t)) de += 1
      i += 1
    }
    // exact operation order of the TextOps expression forms
    val ntD = math.max(nt, 1).toDouble
    val nonAlphaR = nonAlpha.toDouble / math.max(len, 1).toDouble
    val avgTok = (len - (nt - 1)).toDouble / ntD
    val stopR = stop.toDouble / ntD
    val sEn = en.toDouble / ntD
    val sEs = es.toDouble / ntD
    val sDe = de.toDouble / ntD
    val quality = 0.4 * (1.0 - nonAlphaR) +
      0.3 * math.min(nt.toDouble / 100.0, 1.0) +
      0.3 * math.min(stopR * 5.0, 1.0)
    val lang =
      if (sEn >= 0.01 && sEn >= sEs && sEn >= sDe) "en"
      else if (sEs >= 0.01 && sEs >= sDe) "es"
      else if (sDe >= 0.01) "de"
      else "unknown"
    new GenericInternalRow(Array[Any](nt, avgTok, nonAlphaR, stopR, quality,
      sEn, sEs, sDe, UTF8String.fromString(lang)))
  }
}
