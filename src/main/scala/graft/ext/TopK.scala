package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scored candidate for top-k aggregation. */
case class Scored(id: Long, score: Double)

/** Typed Aggregator keeping the top k entries (score desc, id asc tie-break)
  * in a bounded buffer.
  *
  * The window formulation of top-k (`row_number <= k`) shuffles EVERY
  * candidate row to its group's reducer and sorts there; this aggregator's
  * partial (map-side) reduction caps each partition's contribution at k
  * rows per group, so the shuffle carries O(groups·k) rows — the 100 TB
  * formulation of "top-k per query". (SURVEY §2.8: aggregate tier =
  * Aggregator[IN, BUF, OUT].)
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {

  /** One udaf instance per k for the JVM's lifetime — fresh instances per
    * query build would re-generate the typed serde per plan and pay its
    * codegen+JIT inside every execution (see [[graft.ext.Sketch]]'s
    * cachedUdaf note / NOTES r12 q108). */
  private val aggCache = new java.util.concurrent.ConcurrentHashMap[
    Int, org.apache.spark.sql.expressions.UserDefinedFunction]()

  /** Untyped column form: `topKAgg(k)(idCol, scoreCol)` inside an agg. */
  def topKAgg(k: Int): (Column, Column) => Column = {
    val agg = aggCache.computeIfAbsent(k, kk => udaf(new TopKAggregator(kk)))
    (id, score) => agg(id, score)
  }

  /** Per-group top-k of (idCol, scoreCol) rows: returns groupCols + id +
    * score + rank, equivalent to the row_number-window top-k but with
    * bounded map-side partials. */
  def topKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                   scoreCol: String, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(topKAgg(k)(col(idCol), col(scoreCol)).as("_topk"))
      .select(col(groupCol), posexplode(col("_topk")).as(Seq("_pos", "_e")))
      .select(col(groupCol), col("_e.id").as(idCol), col("_e.score").as(scoreCol),
        (col("_pos") + 1).as("rank"))
}
