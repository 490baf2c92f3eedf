import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bisect115 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bisect] $n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$r")
    }
    val base = graft.util.Tables.load(spark, dir, "documents").select("doc_id","text")
      .repartition(spark.sparkContext.defaultParallelism)
    time("scan+repartition")(base.count())
    time("scan+repartition warm")(base.count())
    val k = 4
    val grams = base
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("_gl", when(size(col("_ws")) >= k, expr(
        s"transform(sequence(1, size(_ws) - ${k - 1}), i -> CAST(conv(substring(md5(CAST(concat('wfp:', concat_ws(' ', slice(_ws, i, $k))) AS binary)), 1, 15), 16, 10) AS bigint))"))
        .otherwise(expr("CAST(array() AS array<bigint>)")))
      .select(col("doc_id"), posexplode(col("_gl")).as(Seq("_i0", "_h")))
    time("gram build")(grams.count())
    time("gram build warm")(grams.count())
    val W = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("_i0"))
    val sel = grams.withColumn("_wmin", min(col("_h")).over(W.rowsBetween(0, 7)))
      .withColumn("_selmax", max(col("_wmin")).over(W.rowsBetween(-7, 0)))
      .filter(col("_selmax") === col("_h")).select(col("doc_id"), col("_h")).distinct()
    time("windows+distinct")(sel.count())
    time("full fp warm")(sel.count())
    spark.stop()
  }
}
