package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.util.Tables.load

/** Similarity-search surface over `embeddings`: brute-force cosine top-k
  * (baseline), threshold near-dup pairs, and sign-LSH ANN (scale path;
  * rows-only check — the hyperplane literals aren't SQL-expressible).
  */
object SimilarityQueries {

  def q25CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("cand_id"))
  }

  def q26EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(load(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, maxId = 2000L)
      .orderBy(col("vec_a"), col("vec_b"))

  /** Rows-only check (no SQL oracle): ANN via deterministic sign-LSH buckets;
    * recall-vs-brute-force is asserted in SimilaritySpec instead. */
  def q31AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .orderBy(col("query_id"), col("cand_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_cosine_topk" -> (q25CosineTopK _),
    "q26_embedding_neardup" -> (q26EmbeddingNearDup _),
    "q31_ann_lsh" -> (q31AnnLsh _)
  )

  val sql: Map[String, String] = Map(
    "q25_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        | s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM q, e c WHERE c.vec_id <> q.vec_id)
        |SELECT query_id, cand_id, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q26_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 2000)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.45
        |ORDER BY vec_a, vec_b""".stripMargin
  )
}
