package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-signature MinHash in one pass over the raw text: tokenizes on
  * single spaces, forms word shingleN-grams, and returns the 8 slot minima —
  * slot s = min over shingles of substring(md5("⌊s/4⌋:" + shingle),
  * 1 + 8·(s mod 4), 8), byte-identical to the SQL/DuckDB formulation in
  * DedupQueries. Null when the document has fewer than shingleN tokens
  * (matching the exploded formulation, which emits no row).
  *
  * vs. the relational form (shingle transform → explode → 2×md5 per row →
  * groupBy with 8 min aggregates): no interpreted higher-order lambdas, no
  * explode, no shuffle — signature computation becomes a map-only
  * projection, the difference between a wide job and a scan at 100 TB.
  */
case class MinHashSlots(child: Expression, shingleN: Int = 3) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_slots"

  // Deterministic (a pure function of the input). Single-evaluation per row
  // is guaranteed structurally, not by abusing the non-determinism flag:
  // CollapseProject refuses to duplicate non-cheap expressions (SPARK-36718),
  // and codegen subexpression elimination folds any surviving duplicate
  // references into one kernel call. MinHashSpec asserts the plan shape.

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.compute(v.asInstanceOf[UTF8String], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.compute($c, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
    code
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSlots {
  def minhashSlots(text: Column, shingleN: Int = 3): Column =
    ColumnBridge.column(MinHashSlots(ColumnBridge.expression(text), shingleN))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object MinHashKernel {

  val NumDigests = 2
  val SlotsPerDigest = 4
  val NumSlots: Int = NumDigests * SlotsPerDigest

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Null when the text has fewer than shingleN tokens. Duplicate shingles
    * need no dedup — min over a multiset equals min over its support. */
  def compute(text: UTF8String, shingleN: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < shingleN) return null
    val digest = md5.get()
    val mins = new Array[String](NumSlots)
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
      val sg = sb.toString
      var d = 0
      while (d < NumDigests) {
        digest.reset()
        val h = hex(digest.digest(s"$d:$sg".getBytes(StandardCharsets.UTF_8)))
        var k = 0
        while (k < SlotsPerDigest) {
          val slice = h.substring(8 * k, 8 * k + 8)
          val slot = d * SlotsPerDigest + k
          if (mins(slot) == null || slice.compareTo(mins(slot)) < 0) mins(slot) = slice
          k += 1
        }
        d += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m)).asInstanceOf[Array[Any]])
  }
}
