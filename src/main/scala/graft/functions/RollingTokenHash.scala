package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Rolling polynomial token hash (q30) fused into one pass: fold over the
  * token array of h = (h·31 + hash16(tok)) mod 2³¹−1, where hash16 is the
  * integer value of the first 4 md5 hex chars — i.e. the first two digest
  * bytes. Replaces the `aggregate` HOF whose lambda ran INTERPRETED with a
  * full md5-hex `conv(substring(...))` expression tree per token. The
  * DuckDB mirror (strpos arithmetic over md5 hex) is untouched — the
  * digest bytes are the same bytes the hex substring spells. */
case class RollingTokenHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_token_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_rolling_token_hash needs array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    RollingHashKernel.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashKernel.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RollingTokenHash {
  def rollingTokenHash(toks: Column): Column =
    ColumnBridge.column(RollingTokenHash(ColumnBridge.expression(toks)))
}

/** Static kernel (separate object so the codegen static call always
  * resolves). */
object RollingHashKernel {

  private val Mod = 2147483647L

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(toks: ArrayData): Long = {
    val digest = md5.get()
    val n = toks.numElements()
    var h = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      digest.reset()
      val d = digest.digest(t.toString.getBytes(StandardCharsets.UTF_8))
      // first 4 hex chars == first two digest bytes, big-endian
      val h16 = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      h = (h * 31L + h16) % Mod
      i += 1
    }
    h
  }
}
