package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
  * set against the full corpus, so similarity is computed map-side with no
  * shuffle; only the tiny per-query top-k result shuffles. Scale path: random
  * hyperplane LSH ([[signBuckets]]) prunes candidates to one bucket before the
  * exact re-rank — the 100 TB formulation (bucket join instead of cross join).
  */
object Similarity {

  /** Cosine similarity between two array<double> columns — natively codegen'd
    * (zip_with dot product + aggregate fold, index order, deterministic). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each query vector (broadcast), the k most
    * similar corpus vectors (excluding itself). Ranking uses the rounded
    * similarity with id tie-break for full determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val sims = c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** All-pairs near-duplicate detection by cosine threshold, bounded to ids <
    * maxId (at scale, run on LSH-bucket candidates instead of all pairs). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, maxId: Long): DataFrame = {
    val e = emb.filter(col(idCol) < maxId)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    e.select(col(idCol).as("vec_a"), col("v").as("va"))
      .join(e.select(col(idCol).as("vec_b"), col("v").as("vb")), col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Deterministic ±1 random hyperplanes (seeded md5 over plane/dim indices),
    * materialized as plan-time literals — no data-dependent randomness. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: String = "graft"): Seq[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until numPlanes).map { p =>
      Array.tabulate(dim) { d =>
        val h = digest.digest(s"$seed:$p:$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Sign-LSH bucket id per vector: bit p = (v · plane_p) > 0. Pure map-side
    * expression over broadcast literal planes. */
  def signBuckets(vecCol: Column, planes: Seq[Array[Double]]): Column = {
    val vd = vecCol.cast("array<double>")
    planes.zipWithIndex.map { case (plane, p) =>
      val dot = aggregate(
        zip_with(vd, typedLit(plane.toSeq), (x, c) => x * c),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, 1 << p).otherwise(0)
    }.reduce(_ + _)
  }

  /** ANN top-k via sign-LSH: candidates share the query's bucket; exact cosine
    * re-rank inside the bucket. Trades recall for a bucket-equi-join — the
    * shape that survives 100 TB (shuffle keyed on bucket, AQE-skew-safe). */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("cv"),
      signBuckets(col(vecCol), planes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      signBuckets(col(vecCol), planes).as("qbucket"))
    val sims = c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), col("bucket"),
        round(cosine(col("qv"), col("cv")), 4).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id"))
    sims.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cand_id"), col("bucket"), col("sim"))
  }
}
