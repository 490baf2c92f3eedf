package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding in ONE left-to-right pass — the
  * core named set (`&lt; &gt; &quot; &amp;`) plus NUMERIC references
  * (`&#NNN;` decimal, `&#xHH;` hex) under the HTML5 numeric-reference
  * end-state rules (WHATWG HTML §13.2.5.80):
  *
  *   - 0x00, surrogates (0xD800–0xDFFF), and anything above 0x10FFFF
  *     decode to U+FFFD (never a throw, never a dropped char);
  *   - the C1 range 0x80–0x9F remaps through the spec's windows-1252
  *     table (`&#150;` is an en dash, not a control);
  *   - leading zeros are valid and VALUE-capped, not digit-capped (the
  *     r16 chunk-size lesson applied here);
  *   - one pass means exactly one decode level: `&amp;#65;` comes out
  *     `&#65;`, never `A` — output is never rescanned.
  *
  * An invalid or unterminated reference rides through literally (the
  * `&` advances one char and scanning continues). The `;` lookahead is
  * bounded ([[EntityDecodeKernel.MaxRefLen]]) so a hostile page of
  * ampersands cannot go quadratic; a reference longer than the bound
  * (only reachable via >28 leading zeros) stays literal — the same
  * guarded-window discipline as the container walks.
  *
  * Replaces the q219 replace-chain ([[graft.ext.Html.decodeEntities]]
  * delegates here): the chain has no portable relational spelling for
  * numeric references (the NOTES seam), and a fused kernel is one pass
  * instead of five codegen'd replaces. Named-set-only inputs decode
  * IDENTICALLY to the chain (amp-last ≡ no-output-rescan) — pinned by
  * WebSpec's hand-computed table and the q219 oracle hash.
  */
case class EntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_entity_decode"

  override def nullSafeEval(v: Any): Any =
    EntityDecodeKernel.decode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.EntityDecodeKernel.decode($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EntityDecode {
  def entityDecode(text: Column): Column =
    ColumnBridge.column(EntityDecode(ColumnBridge.expression(text)))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object EntityDecodeKernel {

  /** Max chars between `&` and `;` still treated as a reference — bounds
    * the per-`&` lookahead. The longest meaningful body is `#x10FFFF`
    * (8); 32 leaves room for spec-valid leading zeros. */
  val MaxRefLen = 32

  def decode(text: UTF8String): UTF8String = {
    val t = text.toString
    if (t.indexOf('&') < 0) return text
    val n = t.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        var sc = -1
        var j = i + 1
        val lim = math.min(n, i + 1 + MaxRefLen)
        while (sc < 0 && j < lim) {
          if (t.charAt(j) == ';') sc = j
          j += 1
        }
        val out = if (sc < 0) null else decodedBody(t, i + 1, sc)
        if (out == null) { sb.append(c); i += 1 }
        else { sb.append(out); i = sc + 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** The decoded text of the reference body t[from, until), or null when
    * it is not a recognized reference. */
  private def decodedBody(t: String, from: Int, until: Int): String = {
    val len = until - from
    if (len <= 0) return null
    if (t.charAt(from) == '#') return numeric(t, from + 1, until)
    len match {
      case 2 =>
        if (t.charAt(from) == 'l' && t.charAt(from + 1) == 't') "<"
        else if (t.charAt(from) == 'g' && t.charAt(from + 1) == 't') ">"
        else null
      case 3 =>
        if (t.regionMatches(from, "amp", 0, 3)) "&" else null
      case 4 =>
        if (t.regionMatches(from, "quot", 0, 4)) "\"" else null
      case _ => null
    }
  }

  /** Numeric reference digits t[from, until) (after the `#`): decimal,
    * or hex behind x/X. Value accumulates with a clamp just past the
    * Unicode ceiling so arbitrarily many digits can never overflow —
    * leading zeros are valid, oversized VALUES map to U+FFFD. */
  private def numeric(t: String, from: Int, until: Int): String = {
    var j = from
    var radix = 10
    if (j < until && (t.charAt(j) == 'x' || t.charAt(j) == 'X')) {
      radix = 16
      j += 1
    }
    if (j >= until) return null
    var v = 0
    while (j < until) {
      val d = Character.digit(t.charAt(j), radix)
      if (d < 0) return null
      if (v < 0x110000) v = v * radix + d
      j += 1
    }
    val cp =
      if (v == 0 || v > 0x10FFFF || (v >= 0xD800 && v <= 0xDFFF)) 0xFFFD
      else c1Remap(v)
    new String(Character.toChars(cp))
  }

  /** HTML5 numeric-reference C1 remap (the windows-1252 table); control
    * codepoints the spec leaves unmapped pass through unchanged. */
  private def c1Remap(v: Int): Int = v match {
    case 0x80 => 0x20AC
    case 0x82 => 0x201A
    case 0x83 => 0x0192
    case 0x84 => 0x201E
    case 0x85 => 0x2026
    case 0x86 => 0x2020
    case 0x87 => 0x2021
    case 0x88 => 0x02C6
    case 0x89 => 0x2030
    case 0x8A => 0x0160
    case 0x8B => 0x2039
    case 0x8C => 0x0152
    case 0x8E => 0x017D
    case 0x91 => 0x2018
    case 0x92 => 0x2019
    case 0x93 => 0x201C
    case 0x94 => 0x201D
    case 0x95 => 0x2022
    case 0x96 => 0x2013
    case 0x97 => 0x2014
    case 0x98 => 0x02DC
    case 0x99 => 0x2122
    case 0x9A => 0x0161
    case 0x9B => 0x203A
    case 0x9C => 0x0153
    case 0x9E => 0x017E
    case 0x9F => 0x0178
    case other => other
  }
}
