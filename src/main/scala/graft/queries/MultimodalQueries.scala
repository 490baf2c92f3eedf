package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, TextOps}
import graft.util.Tables.load

/** Multimodal binary-column plumbing surface: opaque payload + typed metadata,
  * with expression-level deterministic pseudo-features (the mapPartitions
  * decode-stub path is exercised in MultimodalSpec; this query keeps the
  * schema/metadata plumbing under the DuckDB oracle).
  */
object MultimodalQueries {

  def q32MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(load(spark, dir, "documents"))
    media.select(
      col("media_id"),
      col("kind"),
      col("meta.n_bytes").as("n_bytes"),
      (lit(1) + TextOps.hash16(col("payload")) % 64).as("fake_width"),
      (lit(1) + floor(col("meta.n_bytes") / 256)).cast("long").as("fake_frames")
    ).orderBy(col("media_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_features" -> (q32MultimodalFeatures _)
  )

  private val hex16 = (0 until 4).map { i =>
    val shift = math.pow(16, 3 - i).toInt
    s"(strpos('0123456789abcdef', substring(md5(text), ${i + 1}, 1)) - 1) * $shift"
  }.mkString(" + ")

  val sql: Map[String, String] = Map(
    "q32_multimodal_features" ->
      s"""SELECT doc_id AS media_id,
         |  'blob:' || source AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST(1 + ($hex16) % 64 AS INTEGER) AS fake_width,
         |  CAST(1 + length(text) // 256 AS BIGINT) AS fake_frames
         |FROM documents ORDER BY media_id""".stripMargin
  )
}
