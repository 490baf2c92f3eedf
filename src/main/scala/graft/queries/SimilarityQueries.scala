package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Fusion, Similarity}
import graft.util.Output.tinySort
import graft.util.Tables.load

/** Similarity-search surface over `embeddings`: brute-force cosine top-k
  * (baseline), threshold near-dup pairs, and sign-LSH ANN (scale path).
  */
object SimilarityQueries {

  def q25CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** q152 — truncated-dimension retrieval audit
    * ([[graft.ext.Similarity.truncatedRecallAudit]], widths 8/16/32/64 of
    * the 64-dim embeddings, k = 5 over the q25 query set): recall@k of
    * prefix-dim cosine top-k against the full-dim truth, in exact basis
    * points — the Matryoshka measurement that prices a prefix-dim
    * candidate index before building it. The oracle replays each width
    * with list_slice and the q25 topk chain. */
  def q152TruncRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.truncatedRecallAudit(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, dims = Seq(8, 16, 32, 64))
      .transform(tinySort(_, col("trunc_dim")))
  }

  /** q166 — margin-based mining ([[graft.ext.Similarity.marginMine]],
    * Artetxe & Schwenk ACL '19): even-id vectors as the source corpus,
    * odd-id as the target, k = 4 neighborhoods, best-margin partner per
    * source with the standard 1.05 acceptance flag. Output bounded by
    * |src| → [[tinySort]]. */
  def q166MarginMining(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.marginMine(e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", k = 4)
      .transform(tinySort(_, col("query_id")))
  }

  /** q168 — margin mining through the IVF shortlist generator
    * ([[graft.ext.Similarity.marginMineIvf]], nlist = 8, nprobe = 2): the
    * q166 miner with candidate generation swapped to the coarse-quantizer
    * equi-join — each direction indexes its own corpus side (the CCMatrix
    * deployment shape). Same margin layer, same output schema; the
    * brute-vs-IVF recall accounting is the ExtSpec law. */
  def q168MarginMiningIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.marginMineIvf(e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", k = 4,
        nlist = 8, nprobe = 2)
      .transform(tinySort(_, col("query_id")))
  }

  /** q167 — k-NN majority-vote label audit
    * ([[graft.ext.Similarity.knnClassify]], k = 5): even-id vectors are
    * the labeled pool, odd-id the held-out probes; per probe the majority
    * neighbor label vs its true label — the embedding-quality confusion
    * record. Output bounded by |probes| → [[tinySort]]. */
  def q167KnnLabelAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.knnClassify(e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", "label", k = 5)
      .transform(tinySort(_, col("vec_id")))
  }

  def q26EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(load(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.45, maxId = 2000L)
      .transform(tinySort(_, col("vec_a"), col("vec_b")))

  /** ANN via deterministic sign-LSH buckets. Oracle-checked: the hyperplanes
    * are md5-seeded literals ([[graft.ext.Similarity.hyperplanes]]), so the
    * oracle rebuilds them in SQL — sign bit p of plane (p,d) is the LSB of
    * md5("graft:p:d")'s first byte, i.e. the parity of the hex digest's
    * second character. Recall-vs-brute-force is asserted in SimilaritySpec. */
  def q31AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.annTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** IVF ANN: deterministic hash-ordered centroid sample → map-side nearest-
    * centroid assignment → inverted-list equi-join → bounded top-k re-rank.
    * The oracle rebuilds the same index in SQL (md5-ordered LIMIT sample). */
  def q43AnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** IVF ANN with one Lloyd refinement iteration: the coarse quantizer's
    * centroids are re-centered on their list means (map-side assign + one
    * per-dimension-avg shuffle) before the index is built. The oracle replays
    * the iteration in SQL — assignment, per-dimension means, empty lists
    * keeping their centroid — proving the refinement end-to-end. */
  def q45AnnIvfLloyd(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, lloydIterations = 1)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** q26's near-dup semantics on the scale path: sign-LSH bucket equi-join
    * instead of bounded all-pairs — no id bound, whole corpus. 6 planes /
    * 0.3 threshold picked so collisions actually surface pairs on the
    * testdata's similarity distribution (8 planes at 0.45 → empty result). */
  def q46LshNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairs(load(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, numPlanes = 6)
      .transform(tinySort(_, col("vec_a"), col("vec_b")))

  /** Multi-probe sign-LSH ANN: own bucket + the Hamming-1 bucket at the
    * query's lowest-margin plane. The oracle reproduces the margin argmin
    * from the same md5-seeded planes. */
  def q47AnnMultiProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.annTopKMultiProbe(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** Band-OR LSH near-dup: 3 independent 6-plane sign-LSH tables OR'd —
    * ~3× q46's recall (146 vs 46 true pairs at sf0.01) for three narrow
    * bucket self-joins instead of one. `n_bands` = collision multiplicity. */
  def q50BandedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.bandedNearDupPairs(load(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, bands = 3, planesPerBand = 6)
      .transform(tinySort(_, col("vec_a"), col("vec_b")))

  /** Duplicate clusters over the band-OR near-dup graph: min-label-
    * propagation connected components ([[Dedup.duplicateClusters]]) — the
    * step that turns pairwise detections into keep-one-per-cluster curation
    * decisions. 0.35 threshold sits in the clustering regime on this data
    * (multi-hop chains, no percolation: 32 clusters / max size 4 at sf0.01;
    * 0.3 would merge 60% of surfaced docs into one giant component). */
  def q51DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.bandedNearDupPairs(load(spark, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.35, bands = 3, planesPerBand = 6)
    Dedup.duplicateClusters(pairs, "vec_a", "vec_b")
      .transform(tinySort(_, col("cluster_id"), col("vec_id")))
  }

  /** q191 — cluster-aware leakage-free split
    * ([[graft.ext.Sampling.clusterAwareSplit]]): q51's near-dup clusters
    * routed whole through the q61 md5 80/10/10 assignment, so eval splits
    * can never hold a training twin — the q178 leakage failure mode
    * closed at construction time. Per split: doc counts under the
    * cluster-aware and naive assignments, and the detector-pair leak
    * counts under both (cluster side computed, provably 0; naive side is
    * what per-doc routing would have leaked). */
  def q191ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val pairs = Similarity.bandedNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.35, bands = 3, planesPerBand = 6)
    graft.ext.Sampling.clusterAwareSplit(emb, pairs, "vec_id", "vec_a", "vec_b")
      .transform(tinySort(_, col("split")))
  }

  /** q201 — cluster-aware split through the SPANNING-FOREST detector
    * ([[Similarity.bandedNearDupForest]] → [[graft.ext.Sampling
    * .clusterAwareSplitCounts]], r15 verdict #5 — q191's scale path):
    * per band bucket an in-memory union-find over verified pairs emits
    * only spanning edges — the same transitive closure as q191's full
    * pair materialization (a per-bucket spanning forest preserves the
    * verified pair graph's components exactly), at one n·bands shuffle
    * instead of a quadratic pair shuffle + two embedding joins. The
    * oracle IS the law: DuckDB closes over the FULL detector's pairs
    * while Spark routes the forest — any split/merge divergence is a
    * hash mismatch. Output: the label-only split audit (doc counts per
    * split under cluster-aware and naive routing). */
  def q201ClusterSplitForest(spark: SparkSession, dir: String): DataFrame = {
    val emb = load(spark, dir, "embeddings")
    val pairs = Similarity.bandedNearDupForest(emb, "vec_id", "embedding",
      threshold = 0.35, bands = 3, planesPerBand = 6)
    graft.ext.Sampling.clusterAwareSplitCounts(emb, pairs,
        "vec_id", "vec_a", "vec_b")
      .transform(tinySort(_, col("split")))
  }

  /** q143 — product-quantization ANN ([[Similarity.pqTopK]], Jégou et al.
    * TPAMI '11): the compressed-domain search completing the quantization
    * family — global int8 scale, 8 subquantizers × 16 hash-sampled
    * centroids, integer ADC scan, 20-candidate shortlist, exact cosine
    * re-rank to top 5. The oracle replays codebook assignment, lookup
    * tables and ADC relationally in exact integers; floats only in the
    * final rounded re-rank. */
  def q143AnnPq(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.pqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, shortlist = 20)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** q144 — IVF-PQ ANN ([[Similarity.ivfPqTopK]]): q143's ADC scan gated
    * by q43's coarse quantizer (FAISS IndexIVFPQ, by_residual=false) —
    * each query's integer ADC scan touches only its 4 probed lists of 16,
    * then the shortlist re-ranks exactly. The full compressed-index stack:
    * coarse float assignment replayed by the q43 CTEs, codes/LUTs/ADC by
    * the q143 integer CTEs. */
  def q144AnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, m = 8, ksub = 16, shortlist = 20, nlist = 16, nprobe = 4)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** q145 — cluster-quality audit ([[Similarity.clusterQualityInt8]]):
    * exact-integer WCSS decomposition (n·WCSS = n·Σ||q||² − Σ_d(Σq_d)²)
    * per inverted list of the q43 coarse quantizer, in the globally
    * int8-quantized space — per-cluster tightness in basis points of raw
    * energy, with the corpus-wide row at list_id = −1 as the baseline a
    * useful cluster must beat. */
  def q145ClusterQuality(spark: SparkSession, dir: String): DataFrame =
    Similarity.clusterQualityInt8(load(spark, dir, "embeddings"),
        "vec_id", "embedding", nlist = 16)
      .transform(tinySort(_, col("list_id")))

  /** q148 — residual IVF-PQ ([[Similarity.ivfPqResidualTopK]], FAISS
    * IndexIVFPQ by_residual=true, the library default): PQ codes encode
    * v − centroid(list(v)) so the codebook budget resolves what the coarse
    * quantizer left unexplained; the query builds one ADC table per probed
    * list. Oracle replays centroid subtraction, residual quantization,
    * per-probe lookup tables and the gated ADC relationally. */
  def q148AnnIvfPqResidual(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.ivfPqResidualTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", k = 5, m = 8, ksub = 16, shortlist = 20,
        nlist = 16, nprobe = 4)
      .transform(tinySort(_, col("query_id"), col("cand_id")))
  }

  /** q58 — symmetric int8 embedding quantization
    * ([[Similarity.quantizeInt8]]): per-vector scale + exact integer
    * summaries. Map-only array HOFs, no shuffle — a plain global sort is the
    * correct dump plan (the sampling pass re-runs a cheap scan). */
  def q58EmbeddingQuantize(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(load(spark, dir, "embeddings"), "vec_id", "embedding")
      .orderBy(col("vec_id"))

  /** q60 — SemDeDup ([[Similarity.semDeDup]]): IVF-cluster the embedding
    * space (same deterministic md5-sampled coarse quantizer as q43), then
    * within each cluster drop every vector with a smaller-id cluster-mate
    * above 0.3 cosine (keep-min-id). Output: every vector with its cluster
    * and keep/drop verdict. The oracle replays centroid sample, assignment
    * tie-breaks, and the within-cluster pair filter. */
  def q60SemDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDeDup(load(spark, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, nlist = 16)
      .transform(tinySort(_, col("vec_id")))

  /** q169 — SemDeDup, keep-best-quality ([[Similarity.semDeDupKeepBest]]):
    * q60's clustering and pair detection with the keeper rule corpus
    * curation actually ships (FineWeb practice) — the lower-QUALITY side
    * of each near-dup pair drops, id only breaking exact ties. Quality is
    * the q27 composite over the id-aligned documents table (one fused
    * TextStats kernel pass, proven bit-identical to the oracle), riding
    * the embedding row through the cluster join — no second corpus join. */
  def q169SemDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val q = load(spark, dir, "documents").select(
      col("doc_id").as("vec_id"),
      graft.functions.TextStats.textStats(col("text"),
        Seq("the", "a", "or", "and", "of")).getField("quality").as("q"))
    Similarity.semDeDupKeepBest(
        load(spark, dir, "embeddings").join(q, "vec_id"),
        "vec_id", "embedding", "q", threshold = 0.3, nlist = 16)
      .transform(tinySort(_, col("vec_id")))
  }

  /** q174 — hard-negative mining ([[Similarity.hardNegatives]], k = 3,
    * band [0, 0.45)): per even-id anchor, the three most similar vectors
    * strictly below the q26 near-dup threshold — the contrastive-pair
    * table an embedding-training pipeline exports. Rank included so the
    * negative ORDER (hardest first) is part of the checked contract. */
  def q174HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.hardNegatives(e, e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", k = 3, ceil = 0.45, floor = 0.0)
      .transform(tinySort(_, col("query_id"), col("rank")))
  }

  /** q68 — per-label int8 centroids ([[Similarity.labelCentroidsInt8]]):
    * exact BIGINT sums over the quantized space, one division per output
    * row. |labels|·dims output rows → [[tinySort]]. */
  /** q180 — prototypicality pruning
    * ([[Similarity.prototypicalityPrune]], keep hardest 60 %): per label
    * cluster, each vector ranked by exact-integer distance to the cluster
    * prototype (||n·q − S||² in the q68 quantized space), percentile in
    * bp, keep flag — the Sorscher/D4 hard-example selection. */
  def q180PrototypicalityPrune(spark: SparkSession, dir: String): DataFrame =
    Similarity.prototypicalityPrune(load(spark, dir, "embeddings"),
        "vec_id", "embedding", "label", keepBp = 6000L)
      .transform(tinySort(_, col("vec_id")))

  def q68LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroidsInt8(load(spark, dir, "embeddings"),
        "label", "embedding")
      .transform(tinySort(_, col("label"), col("pos")))

  /** q107 — reciprocal-rank fusion ([[graft.ext.Fusion]]) of the two
    * independent ANN retrievals (q31's sign-LSH list and q43's IVF list)
    * into one hybrid ranking — the standard score-calibration-free list
    * merge of a retrieval/RAG pipeline. Inputs are bounded top-k lists, so
    * the rank windows and the full-outer merge are O(queries·k); each RRF
    * score is two exact IEEE reciprocals summed once (engine-portable). */
  def q107RrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    val lsh = Similarity.annTopK(e, q, "vec_id", "embedding", 5)
      .select(col("query_id"), col("cand_id"), col("sim"))
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4)
    Fusion.reciprocalRankFusion(lsh, ivf, "rank_lsh", "rank_ivf")
      .transform(tinySort(_, col("query_id"), col("fused_rank")))
  }

  /** q188 — IVF index-maintenance audit
    * ([[graft.ext.Similarity.ivfMaintenanceAudit]]): the index corpus is
    * every embedding with id ≢ 0 mod 4 ("trained" quantizer: md5-sample
    * centroids from THIS side only), the arriving shard is the rest;
    * per frozen list the index/new occupancies and the exact-bp share
    * drift — the re-train-the-quantizer alarm a production vector store
    * monitors. Lists the shard misses report n_new = 0 (seeded from the
    * centroid set — an emptying list is drift signal too). */
  def q188IvfMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "embeddings")
    Similarity.ivfMaintenanceAudit(
        e.filter(col("vec_id") % 4 =!= 0), e.filter(col("vec_id") % 4 === 0),
        "vec_id", "embedding", nlist = 16)
      .transform(tinySort(_, col("list_id")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q188_ivf_maintenance" -> (q188IvfMaintenance _),
    "q143_ann_pq" -> (q143AnnPq _),
    "q152_trunc_recall" -> (q152TruncRecall _),
    "q144_ann_ivfpq" -> (q144AnnIvfPq _),
    "q145_cluster_quality" -> (q145ClusterQuality _),
    "q148_ann_ivfpq_residual" -> (q148AnnIvfPqResidual _),
    "q25_cosine_topk" -> (q25CosineTopK _),
    "q107_rrf_fusion" -> (q107RrfFusion _),
    "q68_label_centroids" -> (q68LabelCentroids _),
    "q180_prototypicality_prune" -> (q180PrototypicalityPrune _),
    "q58_embedding_quantize" -> (q58EmbeddingQuantize _),
    "q26_embedding_neardup" -> (q26EmbeddingNearDup _),
    "q31_ann_lsh" -> (q31AnnLsh _),
    "q43_ann_ivf" -> (q43AnnIvf _),
    "q45_ann_ivf_lloyd" -> (q45AnnIvfLloyd _),
    "q46_lsh_neardup" -> (q46LshNearDup _),
    "q47_ann_multiprobe" -> (q47AnnMultiProbe _),
    "q166_margin_mining" -> (q166MarginMining _),
    "q167_knn_label_audit" -> (q167KnnLabelAudit _),
    "q168_margin_mining_ivf" -> (q168MarginMiningIvf _),
    "q169_semdedup_keepbest" -> (q169SemDedupKeepBest _),
    "q174_hard_negatives" -> (q174HardNegatives _),
    "q50_banded_neardup" -> (q50BandedNearDup _),
    "q51_dup_clusters" -> (q51DupClusters _),
    "q191_cluster_split" -> (q191ClusterSplit _),
    "q201_cluster_split_forest" -> (q201ClusterSplitForest _),
    "q60_semdedup" -> (q60SemDedup _)
  )

  /** Shared CTE chain: band-OR sign-LSH detector at 0.35 → `pairs` →
    * transitive closure → `labels` (vec_id, cluster_id). Used by q51 and the
    * q53 curation capstone. */
  // the detector/closure tail shared by ClusterLabelCtes and the
  // parameterized clusterLabelCtes — declared FIRST (a val interpolating a
  // later val silently interpolates null; the standing NOTES lesson)
  private val ClusterLabelTail: String =
    """ planes AS (
      |  SELECT b, p, d,
      |    CASE WHEN substr(md5('graft:b' || b || ':' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
      |         THEN 1.0 ELSE -1.0 END AS w
      |  FROM range(0,3) tb(b), range(0,6) t1(p), range(0,64) t2(d)),
      | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
      | dots AS (SELECT ev.vec_id, pl.b, pl.p, SUM(ev.x * pl.w) AS dp
      |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.b, pl.p),
      | buckets AS (SELECT vec_id, b, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
      |             FROM dots GROUP BY vec_id, b),
      | cand AS (SELECT DISTINCT a.vec_id AS vec_a, c.vec_id AS vec_b
      |          FROM buckets a JOIN buckets c ON a.b = c.b AND a.bucket = c.bucket AND a.vec_id < c.vec_id),
      | pairs AS (
      |  SELECT cand.vec_a, cand.vec_b FROM cand
      |  JOIN e ea ON ea.vec_id = cand.vec_a
      |  JOIN e eb ON eb.vec_id = cand.vec_b
      |  WHERE list_cosine_similarity(ea.v, eb.v) > 0.35),
      | edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
      |           UNION SELECT vec_b, vec_a FROM pairs),
      | reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
      | labels AS (
      |  SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
      |  FROM reach GROUP BY a)""".stripMargin

  /** [[ClusterLabelCtes]] with a caller-supplied `e` population — the q195
    * capstone restricts the detector to its curation survivors while q51
    * and q191 cluster the whole table. */
  private[queries] def clusterLabelCtes(eSql: String): String =
    s"""e AS ($eSql),
      |$ClusterLabelTail""".stripMargin

  private[queries] val ClusterLabelCtes: String =
    clusterLabelCtes("SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings")

  val sql: Map[String, String] = Map(
    /* q188: the q43 IVF idiom — md5-ordered centroid sample from the
     * INDEX side only, nearest-list assignment with rounded cosine and
     * the (s DESC, cid DESC) tie-break — applied twice (index + shard),
     * seeded from the centroid set so untouched lists report 0, share
     * drift via HUGEINT cross-multiplication ≡ Spark DECIMAL(38,0). */
    "q188_ivf_maintenance" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | ei AS (SELECT * FROM e WHERE vec_id % 4 <> 0),
        | es AS (SELECT * FROM e WHERE vec_id % 4 = 0),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM ei
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | ai AS (SELECT ei.vec_id, c.cid,
        |          round(list_cosine_similarity(ei.v, c.cv), 4) AS s
        |        FROM ei CROSS JOIN cents c),
        | li AS (SELECT vec_id, cid FROM ai
        |        QUALIFY row_number() OVER (PARTITION BY vec_id
        |          ORDER BY s DESC, cid DESC) = 1),
        | a2 AS (SELECT es.vec_id, c.cid,
        |          round(list_cosine_similarity(es.v, c.cv), 4) AS s
        |        FROM es CROSS JOIN cents c),
        | ls AS (SELECT vec_id, cid FROM a2
        |        QUALIFY row_number() OVER (PARTITION BY vec_id
        |          ORDER BY s DESC, cid DESC) = 1),
        | ci AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_index
        |        FROM li GROUP BY 1),
        | cs AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_new
        |        FROM ls GROUP BY 1),
        | j AS (SELECT c.cid AS list_id,
        |         COALESCE(ci.n_index, 0) AS n_index,
        |         COALESCE(cs.n_new, 0) AS n_new
        |       FROM cents c LEFT JOIN ci ON ci.cid = c.cid
        |         LEFT JOIN cs ON cs.cid = c.cid),
        | t AS (SELECT *, CAST(SUM(n_index) OVER () AS BIGINT) AS ti,
        |         CAST(SUM(n_new) OVER () AS BIGINT) AS tn FROM j)
        |SELECT list_id, n_index, n_new,
        |  CAST((10000 * abs(CAST(n_new AS HUGEINT) * ti
        |      - CAST(n_index AS HUGEINT) * tn))
        |    // (CAST(GREATEST(ti, 1) AS HUGEINT) * GREATEST(tn, 1))
        |    AS BIGINT) AS share_drift_bp
        |FROM t ORDER BY list_id""".stripMargin,
    /* RRF: q31's LSH chain and q43's IVF chain rebuilt side by side,
     * per-list ranks = the same row_number that selects their top-5, then
     * the two-term reciprocal sum. CAST(1 AS DOUBLE) keeps the division
     * IEEE (a bare 1.0 literal is DECIMAL in DuckDB). */
    "q107_rrf_fusion" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | planes AS (
        |  SELECT p, d,
        |    CASE WHEN substr(md5('graft:' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |         THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(0,8) t1(p), range(0,64) t2(d)),
        | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
        | dots AS (SELECT ev.vec_id, pl.p, SUM(ev.x * pl.w) AS dp
        |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.p),
        | buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
        |             FROM dots GROUP BY vec_id),
        | lq AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING(vec_id) WHERE e.vec_id < 10),
        | lc AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING(vec_id)),
        | ls AS (SELECT lq.vec_id AS query_id, lc.vec_id AS cand_id,
        |          round(list_cosine_similarity(lq.v, lc.v), 4) AS sim
        |        FROM lq JOIN lc ON lc.bucket = lq.bucket AND lc.vec_id <> lq.vec_id),
        | lr AS (SELECT query_id, cand_id,
        |          CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank_lsh
        |        FROM ls
        |        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | probes AS (SELECT vec_id AS query_id, cid AS probe FROM asgn WHERE vec_id < 10
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) <= 4),
        | ivs AS (SELECT p.query_id, l.vec_id AS cand_id,
        |           round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |         FROM probes p
        |         JOIN lists l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |         JOIN e q ON q.vec_id = p.query_id
        |         JOIN e c ON c.vec_id = l.vec_id),
        | ir AS (SELECT query_id, cand_id,
        |          CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rank_ivf
        |        FROM ivs
        |        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5),
        | f AS (SELECT COALESCE(a.query_id, b.query_id) AS query_id,
        |         COALESCE(a.cand_id, b.cand_id) AS cand_id, a.rank_lsh, b.rank_ivf
        |       FROM lr a FULL OUTER JOIN ir b
        |         ON a.query_id = b.query_id AND a.cand_id = b.cand_id),
        | g AS (SELECT query_id, cand_id, rank_lsh, rank_ivf,
        |         COALESCE(CAST(1 AS DOUBLE) / CAST(60 + rank_lsh AS DOUBLE), CAST(0 AS DOUBLE))
        |         + COALESCE(CAST(1 AS DOUBLE) / CAST(60 + rank_ivf AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf_score
        |       FROM f)
        |SELECT query_id, cand_id, rank_lsh, rank_ivf, rrf_score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, cand_id) AS BIGINT) AS fused_rank
        |FROM g
        |ORDER BY query_id, fused_rank""".stripMargin,
    /* q180: the q68 quantization chain per vector, mean-free integer
     * residuals n·q − S squared in HUGEINT (≡ Spark's DECIMAL(38,0) on
     * every in-range value; the distance never ships), rank per label by
     * (d2 DESC, vec_id), integer-div percentile, keep ≤ 6000 bp. */
    "q180_prototypicality_prune" ->
      """WITH b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE label IS NOT NULL),
        | m AS (SELECT vec_id, label, v,
        |         list_max(list_transform(v, x -> abs(x))) AS amax FROM b),
        | s AS (SELECT vec_id, label, v,
        |         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS safe FROM m),
        | q AS (SELECT vec_id, label,
        |         list_transform(v, x -> CAST(least(greatest(round(x / safe),
        |           -127.0), 127.0) AS INT)) AS qv
        |       FROM s),
        | e AS (SELECT vec_id, label, unnest(qv) AS qx,
        |         generate_subscripts(qv, 1) - 1 AS pos FROM q),
        | c AS (SELECT label, pos, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(qx) AS BIGINT) AS sq FROM e GROUP BY 1, 2),
        | d AS (SELECT e.vec_id, e.label,
        |         SUM((CAST(c.n AS HUGEINT) * e.qx - c.sq) *
        |             (CAST(c.n AS HUGEINT) * e.qx - c.sq)) AS d2,
        |         MAX(c.n) AS nlab
        |       FROM e JOIN c ON c.label = e.label AND c.pos = e.pos
        |       GROUP BY 1, 2),
        | r AS (SELECT vec_id, label,
        |         CAST(row_number() OVER (PARTITION BY label
        |           ORDER BY d2 DESC, vec_id) AS BIGINT) AS rank_hard, nlab
        |       FROM d)
        |SELECT vec_id, label, rank_hard,
        |  CAST((10000 * rank_hard) // nlab AS BIGINT) AS pct_bp,
        |  ((10000 * rank_hard) // nlab <= 6000) AS kept
        |FROM r ORDER BY vec_id""".stripMargin,
    "q68_label_centroids" ->
      """WITH b AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | m AS (SELECT label, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM b),
        | s AS (SELECT label, v,
        |         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS safe FROM m),
        | q AS (SELECT label,
        |         list_transform(v, x -> CAST(least(greatest(round(x / safe), -127.0), 127.0) AS INT)) AS qv
        |       FROM s),
        | e AS (SELECT label, unnest(qv) AS qx, generate_subscripts(qv, 1) - 1 AS pos FROM q)
        |SELECT label, CAST(pos AS BIGINT) AS pos, COUNT(*) AS n,
        |  CAST(SUM(qx) AS BIGINT) AS sum_q,
        |  CAST(SUM(qx * qx) AS BIGINT) AS sum_sq,
        |  CAST(SUM(qx) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS centroid
        |FROM e GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,
    /* q143: global int8 scale, md5-ordered 16-vector codebook sample per
     * subquantizer slice, integer squared-L2 code assignment (dd ASC, j ASC),
     * ADC = sum of the query's per-(m, code) table entries, shortlist 20 by
     * (adc ASC, cand ASC), exact rounded cosine re-rank to top 5. */
    "q143_ann_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | gm AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS gmax FROM e),
        | sc AS (SELECT CASE WHEN gmax > 0 THEN gmax / 127.0 ELSE 1.0 END AS safe FROM gm),
        | q8 AS (SELECT vec_id,
        |          list_transform(v, x -> CAST(least(greatest(round(x / sc.safe), -127.0), 127.0) AS INT)) AS qv
        |        FROM e, sc),
        | smp AS (SELECT vec_id, qv FROM q8 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j,
        |          qv AS cqv FROM smp),
        | qd AS (SELECT vec_id, generate_subscripts(qv, 1) - 1 AS d, unnest(qv) AS x FROM q8),
        | cd AS (SELECT j, generate_subscripts(cqv, 1) - 1 AS d, unnest(cqv) AS cx FROM cb),
        | dist AS (SELECT qd.vec_id, qd.d // 8 AS m, cd.j,
        |     SUM(CAST(qd.x - cd.cx AS BIGINT) * (qd.x - cd.cx)) AS dd
        |   FROM qd JOIN cd ON qd.d = cd.d GROUP BY 1, 2, 3),
        | codes AS (SELECT vec_id, m, j AS code FROM dist
        |   QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dd ASC, j ASC) = 1),
        | adc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, SUM(d2.dd) AS adc_dist
        |   FROM (SELECT vec_id FROM q8 WHERE vec_id < 10) q
        |   JOIN codes c ON c.vec_id <> q.vec_id
        |   JOIN dist d2 ON d2.vec_id = q.vec_id AND d2.m = c.m AND d2.j = c.code
        |   GROUP BY 1, 2),
        | short AS (SELECT query_id, cand_id, adc_dist FROM adc
        |   QUALIFY row_number() OVER (PARTITION BY query_id
        |     ORDER BY adc_dist ASC, cand_id ASC) <= 20),
        | rr AS (SELECT s.query_id, s.cand_id, s.adc_dist,
        |     round(list_cosine_similarity(eq.v, ec.v), 4) AS sim
        |   FROM short s JOIN e eq ON eq.vec_id = s.query_id
        |                JOIN e ec ON ec.vec_id = s.cand_id)
        |SELECT query_id, cand_id, CAST(adc_dist AS BIGINT) AS adc_dist, sim FROM rr
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    /* q145: q43's assignment + the global-quant chain, then the mean-free
     * SS identity on HUGEINT — n, Σ||q||², n·ssq − Σ_d s_d², bp ratio. */
    "q145_cluster_quality" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | gm AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS gmax FROM e),
        | sc AS (SELECT CASE WHEN gmax > 0 THEN gmax / 127.0 ELSE 1.0 END AS safe FROM gm),
        | q8 AS (SELECT vec_id,
        |          list_transform(v, x -> CAST(least(greatest(round(x / sc.safe), -127.0), 127.0) AS INT)) AS qv
        |        FROM e, sc),
        | un AS (SELECT l.list_id, q8.vec_id, q8.qv FROM lists l JOIN q8 USING (vec_id)
        |        UNION ALL SELECT -1, vec_id, qv FROM q8),
        | cnt AS (SELECT list_id, COUNT(*) AS n FROM un GROUP BY 1),
        | xd AS (SELECT list_id, vec_id, unnest(qv) AS x,
        |          generate_subscripts(qv, 1) AS d FROM un),
        | dims AS (SELECT list_id, d, SUM(CAST(x AS BIGINT)) AS s,
        |            SUM(CAST(x AS BIGINT) * x) AS ssq_d
        |          FROM xd GROUP BY 1, 2),
        | a2 AS (SELECT list_id, SUM(CAST(s AS HUGEINT) * s) AS snorm,
        |          SUM(ssq_d) AS ssq FROM dims GROUP BY 1),
        | j AS (SELECT c.list_id, c.n, a.ssq,
        |         CAST(c.n AS HUGEINT) * a.ssq - a.snorm AS wcss_x_n
        |       FROM cnt c JOIN a2 a USING (list_id))
        |SELECT CAST(list_id AS BIGINT) AS list_id, CAST(n AS BIGINT) AS n,
        |  CAST(ssq AS BIGINT) AS ssq, CAST(wcss_x_n AS BIGINT) AS wcss_x_n,
        |  CASE WHEN n * ssq > 0 THEN
        |    CAST((10000 * wcss_x_n) // (CAST(n AS HUGEINT) * ssq) AS BIGINT) END AS dispersion_bp
        |FROM j ORDER BY list_id""".stripMargin,
    /* q148: q144's coarse gating + residual encoding — centroid-subtracted
     * vectors quantized with the residual-global scale, codebook = the
     * md5-sample's residuals, one per-(query, probe) lookup table. */
    "q148_ann_ivfpq_residual" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | probes AS (SELECT vec_id AS query_id, cid AS probe FROM asgn WHERE vec_id < 10
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) <= 4),
        | rs AS (SELECT l.vec_id, l.list_id,
        |          list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS rv
        |        FROM lists l JOIN e ON e.vec_id = l.vec_id
        |                     JOIN cents c ON c.cid = l.list_id),
        | gm AS (SELECT max(list_max(list_transform(rv, x -> abs(x)))) AS gmax FROM rs),
        | sc AS (SELECT CASE WHEN gmax > 0 THEN gmax / 127.0 ELSE 1.0 END AS safe FROM gm),
        | q8 AS (SELECT vec_id, list_id,
        |          list_transform(rv, x -> CAST(least(greatest(round(x / sc.safe), -127.0), 127.0) AS INT)) AS qv
        |        FROM rs, sc),
        | smp AS (SELECT vec_id, qv FROM q8 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j,
        |          qv AS cqv FROM smp),
        | qd AS (SELECT vec_id, generate_subscripts(qv, 1) - 1 AS d, unnest(qv) AS x FROM q8),
        | cd AS (SELECT j, generate_subscripts(cqv, 1) - 1 AS d, unnest(cqv) AS cx FROM cb),
        | dist AS (SELECT qd.vec_id, qd.d // 8 AS m, cd.j,
        |     SUM(CAST(qd.x - cd.cx AS BIGINT) * (qd.x - cd.cx)) AS dd
        |   FROM qd JOIN cd ON qd.d = cd.d GROUP BY 1, 2, 3),
        | codes AS (SELECT vec_id, m, j AS code FROM dist
        |   QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dd ASC, j ASC) = 1),
        | qrs AS (SELECT p.query_id, p.probe,
        |           list_transform(range(1, len(e.v) + 1), i -> e.v[i] - c.cv[i]) AS rv
        |         FROM probes p JOIN e ON e.vec_id = p.query_id
        |                       JOIN cents c ON c.cid = p.probe),
        | qq8 AS (SELECT query_id, probe,
        |           list_transform(rv, x -> CAST(least(greatest(round(x / sc.safe), -127.0), 127.0) AS INT)) AS qv
        |         FROM qrs, sc),
        | qqd AS (SELECT query_id, probe, generate_subscripts(qv, 1) - 1 AS d,
        |           unnest(qv) AS x FROM qq8),
        | qdist AS (SELECT qqd.query_id, qqd.probe, qqd.d // 8 AS m, cd.j,
        |     SUM(CAST(qqd.x - cd.cx AS BIGINT) * (qqd.x - cd.cx)) AS dd
        |   FROM qqd JOIN cd ON qqd.d = cd.d GROUP BY 1, 2, 3, 4),
        | adc AS (SELECT p.query_id, l.vec_id AS cand_id, SUM(d2.dd) AS adc_dist
        |   FROM probes p
        |   JOIN lists l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |   JOIN codes c ON c.vec_id = l.vec_id
        |   JOIN qdist d2 ON d2.query_id = p.query_id AND d2.probe = p.probe
        |                AND d2.m = c.m AND d2.j = c.code
        |   GROUP BY 1, 2),
        | short AS (SELECT query_id, cand_id, adc_dist FROM adc
        |   QUALIFY row_number() OVER (PARTITION BY query_id
        |     ORDER BY adc_dist ASC, cand_id ASC) <= 20),
        | rr AS (SELECT s.query_id, s.cand_id, s.adc_dist,
        |     round(list_cosine_similarity(eq.v, ec.v), 4) AS sim
        |   FROM short s JOIN e eq ON eq.vec_id = s.query_id
        |                JOIN e ec ON ec.vec_id = s.cand_id)
        |SELECT query_id, cand_id, CAST(adc_dist AS BIGINT) AS adc_dist, sim FROM rr
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    /* q144: q43's coarse CTEs (md5 sample, rounded-cosine argmax with cid
     * DESC ties, nprobe=4 probes) gate q143's integer ADC chain. */
    "q144_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | probes AS (SELECT vec_id AS query_id, cid AS probe FROM asgn WHERE vec_id < 10
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) <= 4),
        | gm AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS gmax FROM e),
        | sc AS (SELECT CASE WHEN gmax > 0 THEN gmax / 127.0 ELSE 1.0 END AS safe FROM gm),
        | q8 AS (SELECT vec_id,
        |          list_transform(v, x -> CAST(least(greatest(round(x / sc.safe), -127.0), 127.0) AS INT)) AS qv
        |        FROM e, sc),
        | smp AS (SELECT vec_id, qv FROM q8 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS j,
        |          qv AS cqv FROM smp),
        | qd AS (SELECT vec_id, generate_subscripts(qv, 1) - 1 AS d, unnest(qv) AS x FROM q8),
        | cd AS (SELECT j, generate_subscripts(cqv, 1) - 1 AS d, unnest(cqv) AS cx FROM cb),
        | dist AS (SELECT qd.vec_id, qd.d // 8 AS m, cd.j,
        |     SUM(CAST(qd.x - cd.cx AS BIGINT) * (qd.x - cd.cx)) AS dd
        |   FROM qd JOIN cd ON qd.d = cd.d GROUP BY 1, 2, 3),
        | codes AS (SELECT vec_id, m, j AS code FROM dist
        |   QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY dd ASC, j ASC) = 1),
        | adc AS (SELECT p.query_id, l.vec_id AS cand_id, SUM(d2.dd) AS adc_dist
        |   FROM probes p
        |   JOIN lists l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |   JOIN codes c ON c.vec_id = l.vec_id
        |   JOIN dist d2 ON d2.vec_id = p.query_id AND d2.m = c.m AND d2.j = c.code
        |   GROUP BY 1, 2),
        | short AS (SELECT query_id, cand_id, adc_dist FROM adc
        |   QUALIFY row_number() OVER (PARTITION BY query_id
        |     ORDER BY adc_dist ASC, cand_id ASC) <= 20),
        | rr AS (SELECT s.query_id, s.cand_id, s.adc_dist,
        |     round(list_cosine_similarity(eq.v, ec.v), 4) AS sim
        |   FROM short s JOIN e eq ON eq.vec_id = s.query_id
        |                JOIN e ec ON ec.vec_id = s.cand_id)
        |SELECT query_id, cand_id, CAST(adc_dist AS BIGINT) AS adc_dist, sim FROM rr
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id ASC) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q58_embedding_quantize" ->
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | m AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM b),
        | s AS (SELECT vec_id, v, amax,
        |         CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS safe FROM m),
        | q AS (SELECT vec_id, amax,
        |         list_transform(v, x -> CAST(least(greatest(round(x / safe), -127.0), 127.0) AS INT)) AS qv
        |       FROM s)
        |SELECT vec_id,
        |  CAST(len(qv) AS BIGINT) AS n_dims,
        |  amax / 127.0 AS scale,
        |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_saturated
        |FROM q ORDER BY vec_id""".stripMargin,
    /* q152: the q25 topk chain replayed per truncation width over
     * list_slice prefixes; the width-64 level IS the truth set, the rest
     * left-join against it for hit counting. */
    "q152_trunc_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | dims AS (SELECT unnest([8,16,32,64]) AS d),
        | t AS (SELECT d, vec_id, list_slice(v, 1, d) AS tv FROM e, dims),
        | q AS (SELECT d, vec_id, tv FROM t WHERE vec_id < 10),
        | s AS (SELECT q.d, q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.tv, c.tv), 4) AS sim
        |       FROM q JOIN t c ON c.d = q.d AND c.vec_id <> q.vec_id),
        | top AS (SELECT d, query_id, cand_id FROM s
        |         QUALIFY row_number() OVER (PARTITION BY d, query_id
        |                                    ORDER BY sim DESC, cand_id) <= 5),
        | full64 AS (SELECT query_id, cand_id FROM top WHERE d = 64),
        | agg AS (SELECT t.d, COUNT(*) AS n_retrieved,
        |           SUM(CASE WHEN f.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS hits
        |         FROM top t LEFT JOIN full64 f
        |           ON f.query_id = t.query_id AND f.cand_id = t.cand_id
        |         GROUP BY t.d)
        |SELECT CAST(d AS BIGINT) AS trunc_dim,
        |  CAST(n_retrieved AS BIGINT) AS n_retrieved,
        |  CAST(hits AS BIGINT) AS hits,
        |  CAST((CAST(hits AS HUGEINT) * 10000)
        |       // GREATEST(n_retrieved, 1) AS BIGINT) AS recall_bp
        |FROM agg ORDER BY trunc_dim""".stripMargin,
    "q25_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
        | s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM q, e c WHERE c.vec_id <> q.vec_id)
        |SELECT query_id, cand_id, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    /* q174: the q25 chain with the negative band applied BEFORE the rank
     * — membership tests run on the rounded sim, rank rides out as part
     * of the contract (hardest negatives first). */
    "q174_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | q AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
        | s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM q, e c WHERE c.vec_id <> q.vec_id),
        | b AS (SELECT * FROM s WHERE sim < 0.45 AND sim >= 0.0)
        |SELECT query_id, cand_id, sim,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, cand_id) AS BIGINT) AS rank
        |FROM b
        |QUALIFY rank <= 3
        |ORDER BY query_id, rank""".stripMargin,
    /* q166: the margin arithmetic replays the Spark tree exactly — 4-dp
     * cosines, neighborhood sums folded in cand-id order (list_reduce ==
     * the 0.0-init Spark fold), one division by the neighbor count, and
     * margin = sim / ((mf + mb) / 2.0) — so the raw margin double is
     * bit-identical and emitted as-is. */
    "q166_margin_mining" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | s AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
        | t AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 1),
        | fwd AS (SELECT s.vec_id AS query_id, t.vec_id AS cand_id,
        |          round(list_cosine_similarity(s.v, t.v), 4) AS sim
        |         FROM s, t
        |         QUALIFY row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) <= 4),
        | bwd AS (SELECT t.vec_id AS query_id, s.vec_id AS cand_id,
        |          round(list_cosine_similarity(t.v, s.v), 4) AS sim
        |         FROM t, s
        |         QUALIFY row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) <= 4),
        | mf AS (SELECT query_id, list_reduce(list(sim ORDER BY cand_id),
        |          (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS m
        |        FROM fwd GROUP BY query_id),
        | mb AS (SELECT query_id, list_reduce(list(sim ORDER BY cand_id),
        |          (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS m
        |        FROM bwd GROUP BY query_id),
        | pr AS (SELECT f.query_id, f.cand_id, f.sim,
        |          f.sim / ((mf.m + mb.m) / 2.0) AS margin
        |        FROM fwd f JOIN mf ON mf.query_id = f.query_id
        |                   JOIN mb ON mb.query_id = f.cand_id),
        | best AS (SELECT * FROM pr
        |          QUALIFY row_number() OVER (PARTITION BY query_id
        |            ORDER BY margin DESC, cand_id) = 1)
        |SELECT query_id, cand_id, sim, margin,
        |  CAST(CASE WHEN margin >= 1.05 THEN 1 ELSE 0 END AS INTEGER) AS accepted
        |FROM best ORDER BY query_id""".stripMargin,
    /* q168: q166's margin layer verbatim, but fwd/bwd come from the q43
     * IVF replay run per DIRECTION — each side's corpus samples its own
     * 8 centroids in md5(id) order, assigns lists and probes 2 with the
     * identical (s DESC, cid DESC) tie-break, and the 4-dp rounded
     * re-rank keeps (sim DESC, cand_id). A query whose probed lists are
     * empty simply has no rows; neighborhood means divide by the ACTUAL
     * candidate count — both replayed exactly. */
    "q168_margin_mining_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | s AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
        | t AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 1),
        | centf AS (SELECT vec_id AS cid, v AS cv FROM t
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
        | asgnf AS (SELECT t.vec_id, c.cid,
        |             round(list_cosine_similarity(t.v, c.cv), 4) AS sc
        |           FROM t CROSS JOIN centf c),
        | listf AS (SELECT vec_id, cid AS list_id FROM asgnf
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid DESC) = 1),
        | probef AS (SELECT s.vec_id AS query_id, c.cid AS probe
        |            FROM s CROSS JOIN centf c
        |            QUALIFY row_number() OVER (PARTITION BY s.vec_id
        |              ORDER BY round(list_cosine_similarity(s.v, c.cv), 4) DESC, c.cid DESC) <= 2),
        | fwd AS (SELECT p.query_id, l.vec_id AS cand_id,
        |           round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |         FROM probef p
        |         JOIN listf l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |         JOIN s q ON q.vec_id = p.query_id
        |         JOIN t c ON c.vec_id = l.vec_id
        |         QUALIFY row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) <= 4),
        | centb AS (SELECT vec_id AS cid, v AS cv FROM s
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8),
        | asgnb AS (SELECT s.vec_id, c.cid,
        |             round(list_cosine_similarity(s.v, c.cv), 4) AS sc
        |           FROM s CROSS JOIN centb c),
        | listb AS (SELECT vec_id, cid AS list_id FROM asgnb
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, cid DESC) = 1),
        | probeb AS (SELECT t.vec_id AS query_id, c.cid AS probe
        |            FROM t CROSS JOIN centb c
        |            QUALIFY row_number() OVER (PARTITION BY t.vec_id
        |              ORDER BY round(list_cosine_similarity(t.v, c.cv), 4) DESC, c.cid DESC) <= 2),
        | bwd AS (SELECT p.query_id, l.vec_id AS cand_id,
        |           round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |         FROM probeb p
        |         JOIN listb l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |         JOIN t q ON q.vec_id = p.query_id
        |         JOIN s c ON c.vec_id = l.vec_id
        |         QUALIFY row_number() OVER (PARTITION BY query_id
        |           ORDER BY sim DESC, cand_id) <= 4),
        | mf AS (SELECT query_id, list_reduce(list(sim ORDER BY cand_id),
        |          (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS m
        |        FROM fwd GROUP BY query_id),
        | mb AS (SELECT query_id, list_reduce(list(sim ORDER BY cand_id),
        |          (a, b) -> a + b) / CAST(COUNT(*) AS DOUBLE) AS m
        |        FROM bwd GROUP BY query_id),
        | pr AS (SELECT f.query_id, f.cand_id, f.sim,
        |          f.sim / ((mf.m + mb.m) / 2.0) AS margin
        |        FROM fwd f JOIN mf ON mf.query_id = f.query_id
        |                   JOIN mb ON mb.query_id = f.cand_id),
        | best AS (SELECT * FROM pr
        |          QUALIFY row_number() OVER (PARTITION BY query_id
        |            ORDER BY margin DESC, cand_id) = 1)
        |SELECT query_id, cand_id, sim, margin,
        |  CAST(CASE WHEN margin >= 1.05 THEN 1 ELSE 0 END AS INTEGER) AS accepted
        |FROM best ORDER BY query_id""".stripMargin,
    /* q167: the 5-NN lists via the q25 chain restricted to the labeled
     * pool, votes counted per (probe, label), winner by (votes desc,
     * label asc) — all exact integers after the rounded-sim ranking. */
    "q167_knn_label_audit" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        | l AS (SELECT * FROM e WHERE vec_id % 2 = 0 AND label IS NOT NULL),
        | u AS (SELECT * FROM e WHERE vec_id % 2 = 1),
        | nn AS (SELECT u.vec_id AS query_id, l.vec_id AS cand_id,
        |         CAST(l.label AS BIGINT) AS lbl,
        |         round(list_cosine_similarity(u.v, l.v), 4) AS sim
        |        FROM u, l
        |        QUALIFY row_number() OVER (PARTITION BY query_id
        |          ORDER BY sim DESC, cand_id) <= 5),
        | v AS (SELECT query_id, lbl, CAST(COUNT(*) AS BIGINT) AS n_votes
        |       FROM nn GROUP BY query_id, lbl),
        | p AS (SELECT query_id, lbl, n_votes FROM v
        |       QUALIFY row_number() OVER (PARTITION BY query_id
        |         ORDER BY n_votes DESC, lbl) = 1)
        |SELECT p.query_id AS vec_id, p.lbl AS pred_label, p.n_votes,
        |  CAST(u.label AS BIGINT) AS true_label,
        |  CAST(CASE WHEN p.lbl = CAST(u.label AS BIGINT) THEN 1 ELSE 0 END
        |    AS INTEGER) AS correct
        |FROM p JOIN u ON u.vec_id = p.query_id ORDER BY vec_id""".stripMargin,
    "q26_embedding_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 2000)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q31_ann_lsh" ->
      """WITH planes AS (
        |  SELECT p, d,
        |    CASE WHEN substr(md5('graft:' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |         THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(0,8) t1(p), range(0,64) t2(d)),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
        | dots AS (SELECT ev.vec_id, pl.p, SUM(ev.x * pl.w) AS dp
        |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.p),
        | buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
        |             FROM dots GROUP BY vec_id),
        | q AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING(vec_id) WHERE e.vec_id < 10),
        | c AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING(vec_id)),
        | s AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.bucket AS bucket,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM q JOIN c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id)
        |SELECT query_id, cand_id, bucket, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q43_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | probes AS (SELECT vec_id AS query_id, cid AS probe FROM asgn WHERE vec_id < 10
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) <= 4),
        | s AS (SELECT p.query_id, l.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM probes p
        |       JOIN lists l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |       JOIN e q ON q.vec_id = p.query_id
        |       JOIN e c ON c.vec_id = l.vec_id)
        |SELECT query_id, cand_id, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q45_ann_ivf_lloyd" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents0 AS (SELECT vec_id AS cid, v AS cv FROM e
        |            ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn0 AS (SELECT e.vec_id, c.cid,
        |             round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |           FROM e CROSS JOIN cents0 c),
        | lists0 AS (SELECT vec_id, cid AS list_id FROM asgn0
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | mvals AS (SELECT l.list_id, generate_subscripts(e.v, 1) AS d, unnest(e.v) AS x
        |           FROM lists0 l JOIN e ON e.vec_id = l.vec_id),
        | mlists AS (SELECT list_id, list(m ORDER BY d) AS mv FROM
        |              (SELECT list_id, d, avg(x) AS m FROM mvals GROUP BY list_id, d)
        |            GROUP BY list_id),
        | cents AS (SELECT c.cid, COALESCE(m.mv, c.cv) AS cv
        |           FROM cents0 c LEFT JOIN mlists m ON c.cid = m.list_id),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | probes AS (SELECT vec_id AS query_id, cid AS probe FROM asgn WHERE vec_id < 10
        |            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) <= 4),
        | s AS (SELECT p.query_id, l.vec_id AS cand_id,
        |         round(list_cosine_similarity(q.v, c.v), 4) AS sim
        |       FROM probes p
        |       JOIN lists l ON l.list_id = p.probe AND l.vec_id <> p.query_id
        |       JOIN e q ON q.vec_id = p.query_id
        |       JOIN e c ON c.vec_id = l.vec_id)
        |SELECT query_id, cand_id, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q46_lsh_neardup" ->
      """WITH planes AS (
        |  SELECT p, d,
        |    CASE WHEN substr(md5('graft:' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |         THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(0,6) t1(p), range(0,64) t2(d)),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
        | dots AS (SELECT ev.vec_id, pl.p, SUM(ev.x * pl.w) AS dp
        |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.p),
        | buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
        |             FROM dots GROUP BY vec_id),
        | b AS (SELECT e.vec_id, e.v, bk.bucket FROM e JOIN buckets bk USING(vec_id))
        |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, a.bucket AS bucket,
        |  round(list_cosine_similarity(a.v, c.v), 4) AS cos_sim
        |FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
        |WHERE list_cosine_similarity(a.v, c.v) > 0.3
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q47_ann_multiprobe" ->
      """WITH planes AS (
        |  SELECT p, d,
        |    CASE WHEN substr(md5('graft:' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |         THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(0,8) t1(p), range(0,64) t2(d)),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
        | dots AS (SELECT ev.vec_id, pl.p, SUM(ev.x * pl.w) AS dp
        |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.p),
        | buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
        |             FROM dots GROUP BY vec_id),
        | weak AS (SELECT vec_id, p AS wp FROM dots WHERE vec_id < 10
        |          QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY abs(dp) ASC, p ASC) = 1),
        | q AS (SELECT e.vec_id AS query_id, e.v, b.bucket, w.wp
        |       FROM e JOIN buckets b USING(vec_id) JOIN weak w USING(vec_id)
        |       WHERE e.vec_id < 10),
        | probes AS (SELECT query_id, v, bucket AS probe FROM q
        |            UNION ALL
        |            SELECT query_id, v, CAST(xor(bucket, 1 << wp) AS INTEGER) AS probe FROM q),
        | c AS (SELECT e.vec_id, e.v, b.bucket FROM e JOIN buckets b USING(vec_id)),
        | s AS (SELECT p.query_id, c.vec_id AS cand_id,
        |         round(list_cosine_similarity(p.v, c.v), 4) AS sim
        |       FROM probes p JOIN c ON c.bucket = p.probe AND c.vec_id <> p.query_id)
        |SELECT query_id, cand_id, sim FROM s
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) <= 5
        |ORDER BY query_id, cand_id""".stripMargin,
    "q50_banded_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | planes AS (
        |  SELECT b, p, d,
        |    CASE WHEN substr(md5('graft:b' || b || ':' || p || ':' || d), 2, 1) IN ('0','2','4','6','8','a','c','e')
        |         THEN 1.0 ELSE -1.0 END AS w
        |  FROM range(0,3) tb(b), range(0,6) t1(p), range(0,64) t2(d)),
        | ev AS (SELECT vec_id, generate_subscripts(v,1)-1 AS d, unnest(v) AS x FROM e),
        | dots AS (SELECT ev.vec_id, pl.b, pl.p, SUM(ev.x * pl.w) AS dp
        |          FROM ev JOIN planes pl ON ev.d = pl.d GROUP BY ev.vec_id, pl.b, pl.p),
        | buckets AS (SELECT vec_id, b, CAST(SUM(CASE WHEN dp > 0 THEN (1 << p) ELSE 0 END) AS INTEGER) AS bucket
        |             FROM dots GROUP BY vec_id, b),
        | cand AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, CAST(COUNT(*) AS BIGINT) AS n_bands
        |          FROM buckets a JOIN buckets c ON a.b = c.b AND a.bucket = c.bucket AND a.vec_id < c.vec_id
        |          GROUP BY a.vec_id, c.vec_id)
        |SELECT cand.vec_a, cand.vec_b, cand.n_bands,
        |  round(list_cosine_similarity(ea.v, eb.v), 4) AS cos_sim
        |FROM cand
        |JOIN e ea ON ea.vec_id = cand.vec_a
        |JOIN e eb ON eb.vec_id = cand.vec_b
        |WHERE list_cosine_similarity(ea.v, eb.v) > 0.3
        |ORDER BY vec_a, vec_b""".stripMargin,
    /* Connected components replayed as a recursive transitive closure (the
     * pair graph is small — closure is fine for the oracle; the engine side
     * is iterative min-label propagation, the distributed formulation). */
    "q51_dup_clusters" ->
      s"""WITH RECURSIVE $ClusterLabelCtes
        |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
        |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        |FROM labels
        |ORDER BY cluster_id, vec_id""".stripMargin,
    /* q191: the q51 recursive transitive closure supplies cluster labels;
     * split routing is the q61 md5('graft-split:'+key) hex-compare with
     * the CLUSTER id (fallback: own id) as the key; a straddling detector
     * pair counts once for each endpoint's split. */
    "q191_cluster_split" ->
      s"""WITH RECURSIVE $ClusterLabelCtes,
        | asg AS (SELECT e.vec_id AS id, COALESCE(l.cluster_id, e.vec_id) AS gk
        |         FROM embeddings e LEFT JOIN labels l ON l.vec_id = e.vec_id),
        | sp AS (SELECT id,
        |    CASE WHEN substr(md5('graft-split:' || CAST(gk AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5('graft-split:' || CAST(gk AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS sc,
        |    CASE WHEN substr(md5('graft-split:' || CAST(id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5('graft-split:' || CAST(id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS sn
        |   FROM asg),
        | nc AS (SELECT sc AS split, CAST(COUNT(*) AS BIGINT) AS n_docs_cluster FROM sp GROUP BY 1),
        | nn AS (SELECT sn AS split, CAST(COUNT(*) AS BIGINT) AS n_docs_naive FROM sp GROUP BY 1),
        | pe AS (SELECT a.sc AS ca, a.sn AS na, b.sc AS cb, b.sn AS nb
        |        FROM pairs p JOIN sp a ON a.id = p.vec_a JOIN sp b ON b.id = p.vec_b),
        | nl AS (SELECT s.split, CAST(COUNT(*) AS BIGINT) AS naive_cross_pairs FROM (
        |          SELECT unnest([na, nb]) AS split FROM pe WHERE na <> nb) s
        |        GROUP BY 1),
        | cl AS (SELECT s.split, CAST(COUNT(*) AS BIGINT) AS cluster_cross_pairs FROM (
        |          SELECT unnest([ca, cb]) AS split FROM pe WHERE ca <> cb) s
        |        GROUP BY 1),
        | sx AS (SELECT DISTINCT split FROM (SELECT split FROM nc
        |                  UNION ALL SELECT split FROM nn) u)
        |SELECT sx.split,
        |  COALESCE(nc.n_docs_cluster, 0) AS n_docs_cluster,
        |  COALESCE(nn.n_docs_naive, 0) AS n_docs_naive,
        |  COALESCE(nl.naive_cross_pairs, 0) AS naive_cross_pairs,
        |  COALESCE(cl.cluster_cross_pairs, 0) AS cluster_cross_pairs
        |FROM sx LEFT JOIN nc USING (split) LEFT JOIN nn USING (split)
        |LEFT JOIN nl USING (split) LEFT JOIN cl USING (split)
        |ORDER BY sx.split""".stripMargin,
    /* q201: q191's label CTEs verbatim — the closure runs over the FULL
     * verified pair detector, so matching hashes PROVE the Spark-side
     * spanning forest preserved every component (the connectivity law,
     * re-checked per run). Pair-leak columns omitted: they are the only
     * output that depends on the materialized edge set. */
    "q201_cluster_split_forest" ->
      s"""WITH RECURSIVE $ClusterLabelCtes,
        | asg AS (SELECT e.vec_id AS id, COALESCE(l.cluster_id, e.vec_id) AS gk
        |         FROM embeddings e LEFT JOIN labels l ON l.vec_id = e.vec_id),
        | sp AS (SELECT id,
        |    CASE WHEN substr(md5('graft-split:' || CAST(gk AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5('graft-split:' || CAST(gk AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS sc,
        |    CASE WHEN substr(md5('graft-split:' || CAST(id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5('graft-split:' || CAST(id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS sn
        |   FROM asg),
        | nc AS (SELECT sc AS split, CAST(COUNT(*) AS BIGINT) AS n_docs_cluster FROM sp GROUP BY 1),
        | nn AS (SELECT sn AS split, CAST(COUNT(*) AS BIGINT) AS n_docs_naive FROM sp GROUP BY 1),
        | sx AS (SELECT DISTINCT split FROM (SELECT split FROM nc
        |                  UNION ALL SELECT split FROM nn) u)
        |SELECT sx.split,
        |  COALESCE(nc.n_docs_cluster, 0) AS n_docs_cluster,
        |  COALESCE(nn.n_docs_naive, 0) AS n_docs_naive
        |FROM sx LEFT JOIN nc USING (split) LEFT JOIN nn USING (split)
        |ORDER BY sx.split""".stripMargin,
    /* SemDeDup: q43's deterministic index build (md5-ordered centroid
     * sample, round(cos,4) DESC + cid DESC assignment tie-break), then the
     * within-cluster keep-min-id drop rule on the UNROUNDED cosine (the q26
     * convention; nearest pair sits 1.5e-5 from the 0.3 boundary at sf0.1). */
    /* q169: q60's chain with the quality column joined on (the q27 m-CTE
     * arithmetic verbatim — the unrounded composite is bit-identical across
     * engines, so raw dominance comparisons replay exactly); the dominated
     * side of each pair is the lower quality, exact ties drop the larger
     * id (the keep-min-id degeneration). */
    "q169_semdedup_keepbest" ->
      """WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS toks, length(text) AS nc FROM documents),
        | m AS (SELECT doc_id,
        |   0.4 * (1.0 - CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / greatest(nc, 1))
        |   + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
        |   + 0.3 * least(CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'or', 'and', 'of'))) AS DOUBLE) / greatest(len(toks), 1) * 5.0, 1.0) AS q
        | FROM b),
        | e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, m.q
        |       FROM embeddings JOIN m ON m.doc_id = embeddings.vec_id),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | le AS (SELECT l.vec_id, l.list_id, e.v, e.q FROM lists l JOIN e USING (vec_id)),
        | dropped AS (SELECT DISTINCT CASE WHEN a.q < b.q THEN a.vec_id
        |                                  ELSE b.vec_id END AS vec_id
        |             FROM le a JOIN le b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |             WHERE list_cosine_similarity(a.v, b.v) > 0.3)
        |SELECT le.vec_id, CAST(le.list_id AS BIGINT) AS list_id, le.q AS quality,
        |  (d.vec_id IS NULL) AS kept
        |FROM le LEFT JOIN dropped d ON le.vec_id = d.vec_id
        |ORDER BY le.vec_id""".stripMargin,
    "q60_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        | cents AS (SELECT vec_id AS cid, v AS cv FROM e
        |           ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16),
        | asgn AS (SELECT e.vec_id, c.cid,
        |            round(list_cosine_similarity(e.v, c.cv), 4) AS s
        |          FROM e CROSS JOIN cents c),
        | lists AS (SELECT vec_id, cid AS list_id FROM asgn
        |           QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid DESC) = 1),
        | le AS (SELECT l.vec_id, l.list_id, e.v FROM lists l JOIN e USING (vec_id)),
        | dropped AS (SELECT DISTINCT b.vec_id
        |             FROM le a JOIN le b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |             WHERE list_cosine_similarity(a.v, b.v) > 0.3)
        |SELECT le.vec_id, CAST(le.list_id AS BIGINT) AS list_id,
        |  (d.vec_id IS NULL) AS kept
        |FROM le LEFT JOIN dropped d ON le.vec_id = d.vec_id
        |ORDER BY le.vec_id""".stripMargin
  )

}
