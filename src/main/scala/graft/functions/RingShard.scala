package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Consistent-hash RING assignment with virtual nodes (Karger et al.,
  * STOC '97 — the scheme behind Dynamo/Cassandra partitioning; the ring
  * counterpart of [[graft.ext.Layout.rendezvousShard]]'s HRW): each shard
  * owns `vnodes` deterministic positions on a 60-bit hash circle, and an
  * item belongs to the shard owning the first position at or clockwise of
  * the item's hash (successor, wrapping past the top). Growing the ring
  * only INSERTS positions, so an item moves iff a new position lands
  * between its hash and its old successor — expected churn m/(N+m), same
  * minimal-disruption law as HRW, but O(log R) per item instead of O(N)
  * hash evaluations, the trade rings make when N is large.
  *
  * The ring is a pure function of (salt, shard, vnode) — no data, no
  * state ring to store — so it rides into codegen as a sorted constant
  * array and assignment is ONE md5 of the item plus a binary search:
  * map-side, zero shuffles. Hashes are the integer value of the first 15
  * hex chars of md5 (the [[WinnowKernel]] 60-bit idiom), so the DuckDB
  * oracle rebuilds ring and items with the same strpos arithmetic and
  * replays the successor rule as MIN(rh ≥ ih) with wraparound.
  */
case class RingShard(child: Expression, prefix: String,
                     ringHashes: Seq[Long], ringShards: Seq[Int])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ring_shard"

  @transient private lazy val hArr: Array[Long] = ringHashes.toArray
  @transient private lazy val sArr: Array[Int] = ringShards.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ring_shard needs string, got $other")
    }

  /** Instance entry point shared by interpreted eval and codegen. */
  def lookup(id: UTF8String): Int = RingKernel.lookup(id, prefix, hArr, sArr)

  override def nullSafeEval(v: Any): Any = lookup(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ringShard", this, "graft.functions.RingShard")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.lookup($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object RingShard {
  def ringShard(id: Column, prefix: String,
                ringHashes: Seq[Long], ringShards: Seq[Int]): Column =
    ColumnBridge.column(
      RingShard(ColumnBridge.expression(id), prefix, ringHashes, ringShards))
}

/** Static kernel (separate object so driver-side ring construction and the
  * per-row lookup share one hash derivation). */
object RingKernel {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) — identical to the oracle's
    * `strpos`-arithmetic over the first 15 hex chars. */
  def hash60(s: String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var b = 0
    while (b < 8) { v = (v << 8) | (bytes(b) & 0xffL); b += 1 }
    v >>> 4
  }

  /** Successor lookup: first ring position ≥ the item's hash, wrapping to
    * position 0 past the top. `hashes` ascending, `shards` aligned. */
  def lookup(id: UTF8String, prefix: String,
             hashes: Array[Long], shards: Array[Int]): Int = {
    val h = hash60(prefix + id.toString)
    var idx = java.util.Arrays.binarySearch(hashes, h)
    if (idx < 0) idx = -idx - 1
    if (idx == hashes.length) idx = 0
    shards(idx)
  }
}
