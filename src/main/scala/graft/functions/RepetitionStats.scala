package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All three Gopher repetition fractions (q54) in ONE pass over the raw
  * text: duplicate-token fraction, top-2-gram fraction, duplicate-3-gram
  * fraction — replacing three HOF chains (two `array_distinct`s plus a
  * `sort_array` + `aggregate` longest-run scan) that evaluate their lambdas
  * interpreted and materialize three gram arrays per document.
  *
  * One tokenize; a HashSet for distinct tokens; a HashMap multiplicity
  * count for 2-grams (max multiplicity == longest equal-run of the sorted
  * gram array, without the sort); a HashSet for distinct 3-grams. Ratios
  * are the same integer/integer IEEE divisions the expression form
  * computed — bit-identical, so the oracle is untouched. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionKernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.RepetitionKernel.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RepetitionStats {
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object RepetitionKernel {

  def compute(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val distinctToks = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { distinctToks.add(toks(i)); i += 1 }
    val dupTok = 1.0 - distinctToks.size.toDouble / math.max(n, 1).toDouble

    var top2 = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      var best = 0
      i = 0
      while (i < n - 1) {
        val k = toks(i) + " " + toks(i + 1)
        val c = counts.getOrDefault(k, 0) + 1
        counts.put(k, c)
        if (c > best) best = c
        i += 1
      }
      top2 = best.toDouble / (n - 1).toDouble
    }

    var dup3 = 0.0
    if (n >= 3) {
      val d3 = new java.util.HashSet[String](n * 2)
      i = 0
      while (i < n - 2) {
        d3.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
        i += 1
      }
      dup3 = 1.0 - d3.size.toDouble / (n - 2).toDouble
    }
    new GenericInternalRow(Array[Any](dupTok, top2, dup3))
  }
}
