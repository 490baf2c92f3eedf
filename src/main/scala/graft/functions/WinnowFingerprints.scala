package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed fingerprint selection (Schleimer–Wilkerson–Aiken SIGMOD 2003) as
  * ONE fused kernel: per document, the deduped 60-bit hashes of the k-gram
  * positions selected by the winnowing rule (position p is selected iff its
  * hash is the minimum of some window of `w` consecutive k-gram hashes
  * covering p; ties select every achieving position — the deterministic
  * robust-winnowing superset; windows truncate at document edges).
  *
  * Winnowing is DOCUMENT-LOCAL by definition, so the whole selection
  * belongs in a map-side kernel: the equivalent DataFrame formulation
  * (gram HOF → posexplode → two doc-partitioned window functions →
  * distinct) shuffles every gram row twice and evaluates its gram lambda
  * interpreted — measured 3.4 s at sf0.1 for what this kernel does in the
  * scan stage. The hash is the integer value of the first 15 hex chars of
  * md5("wfp:" + gram) — bit-identical to the SQL
  * `conv(substring(md5(...), 1, 15), 16, 10)` the DuckDB oracle replays
  * (first 60 bits of the digest = the first 8 bytes read big-endian,
  * shifted right 4).
  *
  * Null when the document has fewer than k tokens (no grams — the
  * `explode` above every consumer drops the row, like [[WordShingles]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_fingerprints"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_fingerprints needs string, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.compute(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowKernel.compute($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFingerprints {
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object WinnowKernel {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Null when the text has fewer than k tokens. Window arithmetic is
    * O(n·w) with w a small constant — grams per document are hundreds, so
    * the plain loops beat deque bookkeeping. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val n = tokens.length - k + 1
    if (n <= 0) return null
    val d = md5.get()
    val sb = new java.lang.StringBuilder(64)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.append("wfp:")
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      d.reset()
      val bytes = d.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (bytes(b) & 0xffL); b += 1 }
      h(i) = v >>> 4 // first 60 bits == first 15 hex chars as an integer
      i += 1
    }
    // m(j) = min h[j .. j+w-1] (truncated at the end — edge windows only
    // ever select MORE, preserving the detection guarantee)
    val m = new Array[Long](n)
    var j = 0
    while (j < n) {
      var mn = h(j)
      var t = j + 1
      val end = math.min(j + w - 1, n - 1)
      while (t <= end) { if (h(t) < mn) mn = h(t); t += 1 }
      m(j) = mn
      j += 1
    }
    // selected(p) ⟺ max m[p-w+1 .. p] == h(p): every covering window has
    // m_j ≤ h_p, so the max reaches h_p exactly when some window's min IS
    // h_p (the max-of-window-mins identity the SQL mirror uses)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    while (p < n) {
      var mx = m(p)
      var t = math.max(0, p - w + 1)
      while (t < p) { if (m(t) > mx) mx = m(t); t += 1 }
      if (mx == h(p)) out.add(h(p))
      p += 1
    }
    val arr = new Array[Any](out.size())
    var x = 0
    val it = out.iterator()
    while (it.hasNext) { arr(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(arr)
  }
}
