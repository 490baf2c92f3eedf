package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.TopK

/** Aggregation-based top-k ≡ window-based top-k. */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topKPerGroup matches the row_number window formulation") {
    val rng = new scala.util.Random(7)
    val df = (1 to 2000)
      .map(i => (i % 13L, i.toLong, math.rint(rng.nextDouble() * 1e6) / 1e4))
      .toDF("g", "id", "score")
    val viaAgg = TopK.topKPerGroup(df, "g", "id", "score", 5)
      .orderBy("g", "rank").collect().toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("g", "id", "score", "rank")
      .orderBy("g", "rank").collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("groups smaller than k return all rows ranked") {
    val df = Seq((1L, 10L, 3.0), (1L, 11L, 5.0)).toDF("g", "id", "score")
    val out = TopK.topKPerGroup(df, "g", "id", "score", 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((11L, 1), (10L, 2)))
  }
}
