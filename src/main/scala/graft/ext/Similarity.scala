package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small) query
  * set against the full corpus, so similarity is computed map-side with no
  * shuffle; only the tiny per-query top-k result shuffles. Scale path: random
  * hyperplane LSH ([[signBuckets]]) prunes candidates to one bucket before the
  * exact re-rank — the 100 TB formulation (bucket join instead of cross join).
  */
object Similarity {

  import graft.functions.DotProduct.dot

  /** Cosine similarity between two array<double> columns, on the codegen
    * [[graft.functions.DotProduct]] expression (index-order accumulation —
    * deterministic, engine-portable). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine from a precomputed dot and per-side L2 norms — the all-pairs hot
    * path: norms are computed once per VECTOR, not once per pair. */
  def cosineFromNorms(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** L2 norm of an array<double> column. */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Symmetric int8 quantization of an embedding column — the storage/compute
    * compression step before an ANN index ships to serving: per vector,
    * scale = max|x|/127, q_i = clamp(round(x_i/scale), ±127). Emits the scale
    * plus integer summaries (L1 mass, signed sum, saturation count) — exact
    * in both engines; the float path is a single double division + half-away
    * -from-zero round, bit-identical across Spark and the oracle. Pure
    * map-side array HOFs (`transform`/`aggregate`/`filter`) — no shuffle, no
    * UDF: quantizing a 100 TB embedding table runs at scan speed. */
  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = array_max(transform(v, x => abs(x)))
    // all-zero vectors: scale 0 is reported, but quantization divides by 1
    // so q is all-zero instead of NaN
    val safe = when(col("_amax") > 0.0, col("_amax") / 127.0).otherwise(lit(1.0))
    val q = transform(v, x =>
      least(greatest(round(x / col("_safe")), lit(-127.0)), lit(127.0)).cast("int"))
    emb
      .select(col(idCol), v.as(vecCol), amax.as("_amax"))
      .withColumn("_safe", safe)
      .withColumn("_q", q)
      .select(
        col(idCol),
        size(col("_q")).cast("long").as("n_dims"),
        (col("_amax") / 127.0).as("scale"),
        aggregate(col("_q"), lit(0L), (acc, x) => acc + abs(x).cast("long")).as("q_l1"),
        aggregate(col("_q"), lit(0L), (acc, x) => acc + x.cast("long")).as("q_sum"),
        size(filter(col("_q"), x => abs(x) === 127)).cast("long").as("n_saturated"))
  }

  /** Per-label centroid of the int8-QUANTIZED embedding space ([[quantizeInt8]]'s
    * q-vectors): for each (label, dimension) the count, exact integer sum and
    * sum-of-squares of q values, and the centroid coordinate sum/n. Running
    * the centroid pass on quantized integers instead of raw floats makes
    * every aggregate EXACT (BIGINT sums are associative — no accumulation-
    * order drift between a 1000-partition cluster sum and the oracle's
    * sequential one; the only float op left is a single division per output
    * row). This is the class-prototype step of SemDeDup-style pruning / a
    * k-means seeding pass, at 64·|labels| output rows from any corpus size.
    *
    * Scale shape: posexplode is map-side; the (label, pos) aggregation is
    * map-side-combinable with a vocabulary-bounded key space (labels ×
    * dims), so the shuffle carries partial sums, not vectors. */
  def labelCentroidsInt8(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val amax = array_max(transform(v, x => abs(x)))
    val safe = when(col("_amax") > 0.0, col("_amax") / 127.0).otherwise(lit(1.0))
    val q = transform(v, x =>
      least(greatest(round(x / col("_safe")), lit(-127.0)), lit(127.0)).cast("int"))
    emb
      .select(col(labelCol), v.as(vecCol), amax.as("_amax"))
      .withColumn("_safe", safe)
      .select(col(labelCol), posexplode(q).as(Seq("pos", "qx")))
      .groupBy(col(labelCol), col("pos").cast("long").as("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("qx").cast("long")).as("sum_q"),
        sum((col("qx") * col("qx")).cast("long")).as("sum_sq"))
      .withColumn("centroid", col("sum_q").cast("double") / col("n").cast("double"))
  }

  /** Data-pruning by prototypicality (Sorscher et al. '22 "Beyond neural
    * scaling laws" / the D4 recipe): rank every vector within its cluster
    * by distance to the cluster prototype and KEEP the hardest `keepBp`
    * fraction — in the abundant-data regime, easy (near-prototype)
    * examples are the redundant ones. Clusters here are the label column
    * (the supervised prototype of the [[labelCentroidsInt8]] q68 pass);
    * null labels are excluded, as in [[knnClassify]].
    *
    * Exactness: distances live in the int8-QUANTIZED space and compare as
    * ||n·q − S||² (n = cluster size, S = per-dimension integer sum) — the
    * mean-free form keeps every term an integer; squares accumulate in
    * DECIMAL(38,0) (n·127 squared overflows BIGINT once clusters pass
    * ~2^26 rows — the LshPlanner precedent), and the distance itself never
    * leaves the plan: only the rank, the percentile in exact basis
    * points, and the keep flag ship, so no decimal/HUGEINT dtype skew can
    * reach the output. Ties (identical vectors) break by id — documented
    * determinism, not an accident.
    *
    * Scale shape: quantization + explode map-side; the (label, dim)
    * centroid aggregation is map-side-combined over a bounded key space;
    * the distance rollup is one id-keyed aggregation; the rank is a
    * per-LABEL window (bounded partitions — the cluster key IS the
    * partition key). */
  def prototypicalityPrune(emb: DataFrame, idCol: String, vecCol: String,
                           labelCol: String, keepBp: Long): DataFrame = {
    require(keepBp >= 0L && keepBp <= 10000L, s"keepBp out of range: $keepBp")
    val v = col(vecCol).cast("array<double>")
    val amax = array_max(transform(v, x => abs(x)))
    val safe = when(col("_amax") > 0.0, col("_amax") / 127.0).otherwise(lit(1.0))
    val q = transform(v, x =>
      least(greatest(round(x / col("_safe")), lit(-127.0)), lit(127.0)).cast("int"))
    val ex = emb.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol), v.as(vecCol), amax.as("_amax"))
      .withColumn("_safe", safe)
      .select(col(idCol), col(labelCol), posexplode(q).as(Seq("pos", "qx")))
    val cent = ex.groupBy(col(labelCol), col("pos"))
      .agg(count(lit(1)).as("_n"), sum(col("qx").cast("long")).as("_s"))
    val resid = (col("_n") * col("qx") - col("_s")).cast("decimal(38,0)")
    val d2 = ex.join(cent, Seq(labelCol, "pos"))
      .withColumn("_r", resid)
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("_r") * col("_r")).as("_d2"), max(col("_n")).as("_nlab"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(col("_d2").desc, col(idCol))
    d2.withColumn("rank_hard", row_number().over(wRank).cast("long"))
      .withColumn("pct_bp", expr("10000 * rank_hard div _nlab").cast("long"))
      .withColumn("kept", col("pct_bp") <= keepBp)
      .select(col(idCol), col(labelCol), col("rank_hard"), col("pct_bp"),
        col("kept"))
  }

  /** Widen a frame to the cluster's task slots when its source gives fewer
    * splits: broadcast-join scan stages (nested-loop or hash) parallelize
    * by the STREAMED side's partition count — at real scale file splits
    * provide it for free, but a small local parquet collapses to one split
    * and an O(|corpus|·|queries|) pair loop runs on one core (measured:
    * q166's sf1 bench pinned a single thread for minutes). A cheap narrow
    * shuffle locally; the no-op branch at scale. */
  private def ensureSlots(df: DataFrame): DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }

  /** The all-pairs rounded-cosine frame both brute rankers consume:
    * (query_id, cand_id, sim) for every non-self pair, computed map-side
    * against the broadcast query set with per-vector norms. */
  private def pairSims(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String): DataFrame = {
    val c = ensureSlots(corpus.select(col(idCol).as("cand_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cn", l2norm(col("cv"))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4).as("sim"))
  }

  /** Brute-force cosine top-k: for each query vector (broadcast), the k most
    * similar corpus vectors (excluding itself). Ranking uses the rounded
    * similarity with id tie-break for full determinism. The streamed
    * (corpus) side is widened via [[ensureSlots]] — see there. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame =
    // bounded map-side top-k aggregation: the shuffle carries O(queries·k)
    // rows, vs. the window form shuffling every (query, candidate) pair
    TopK.topKPerGroup(pairSims(corpus, queries, idCol, vecCol),
        "query_id", "cand_id", "sim", k)
      .select(col("query_id"), col("cand_id"), col("sim"))

  /** Hard-negative mining — the contrastive-training data op (SimCSE /
    * DPR / SBERT practice: the best negatives are the most similar
    * candidates that are NOT matches): per query, the top-k candidates by
    * similarity STRICTLY BELOW `ceil` (set it to the corpus' near-dup
    * threshold — q26's 0.45 — so dups can't leak into the negative set)
    * and at or above `floor` (excludes easy negatives that teach
    * nothing). The band test runs on the ROUNDED sim (the established
    * engine boundary), so membership is bit-portable.
    *
    * Scale shape: identical to [[bruteForceTopK]] — the band filter
    * applies map-side BEFORE the bounded TopK aggregation (filtering
    * after a plain top-k would return fewer than k, or none, for
    * duplicate-heavy queries); the shuffle still carries O(queries·k).
    * At 100 TB the IVF shortlist generator does NOT substitute directly —
    * its shortlist is top-k overall, which duplicates can crowd out;
    * widen the shortlist (k·probe-depth) before banding instead. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int, ceil: Double,
                    floor: Double = 0.0): DataFrame = {
    require(floor < ceil, s"need floor ($floor) < ceil ($ceil)")
    val banded = pairSims(corpus, queries, idCol, vecCol)
      .filter(col("sim") < ceil && col("sim") >= floor)
    TopK.topKPerGroup(banded, "query_id", "cand_id", "sim", k)
      .select(col("query_id"), col("cand_id"), col("sim"),
        col("rank").cast("long").as("rank"))
  }

  /** Truncated-dimension retrieval audit (the Matryoshka question —
    * Kusupati et al., "Matryoshka Representation Learning", NeurIPS '22:
    * how much top-k quality survives keeping only a PREFIX of each
    * embedding): for every truncation width d, brute-force cosine top-k
    * over the d-dim prefixes is compared against the full-dim top-k, and
    * the audit reports hits and recall@k in exact basis points. This is
    * the measurement that prices the standard ANN memory/recall trade —
    * a d-of-D prefix index is a d/D-size candidate generator whose
    * shortlist the full vectors re-rank (the q143/q144 shortlist
    * pattern) — before committing a 100 TB corpus to an index build.
    *
    * Scale shape: one broadcast of the bounded query set per truncation
    * width over the SAME corpus scan pattern as [[bruteForceTopK]] (the
    * map-side bounded TopK aggregator — O(queries·k) shuffle each); the
    * per-width frames are queries·k small, so the semi-join against the
    * full-dim truth and the final union are driver-negligible. Ranking
    * uses the rounded similarity with id tie-break (deterministic on both
    * engines); the d = full row is the recall-10000 sanity anchor. */
  def truncatedRecallAudit(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           dims: Seq[Int]): DataFrame = {
    val full = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("cand_id"))
      .cache() // queries·k small; consumed once per truncation width
    val perDim = dims.map { d =>
      def trunc(df: DataFrame) =
        df.select(col(idCol), slice(col(vecCol), 1, d).as(vecCol))
      // single pass over the truncated top-k: the hit marker rides a
      // broadcast left join so n_retrieved and hits come from ONE agg
      // (two consumers would re-run the whole brute-force scan)
      bruteForceTopK(trunc(corpus), trunc(queries), idCol, vecCol, k)
        .join(broadcast(full.withColumn("_hit", lit(1L))),
          Seq("query_id", "cand_id"), "left")
        .agg(count(lit(1)).as("n_retrieved"),
          coalesce(sum(col("_hit")), lit(0L)).as("hits"))
        .select(lit(d.toLong).as("trunc_dim"), col("n_retrieved"), col("hits"))
    }
    val audited = perDim.reduce(_ unionByName _)
      .withColumn("recall_bp", expr(
        "CAST(hits AS DECIMAL(38,0)) * 10000 div greatest(n_retrieved, 1)")
        .cast("bigint"))
    // Cache lifecycle (unlike ivfTopK, whose persist deliberately outlives
    // the call): the audit result is |dims| one-row aggregates, so
    // materialize it eagerly here — every consumer of the cached truth
    // frame runs inside this call — and release the cache before
    // returning. The caller reads the tiny checkpointed rows, not `full`.
    val out = Dedup.checkpointStripped(audited)
    full.unpersist(blocking = false)
    out
  }

  /** Margin-based mining (Artetxe & Schwenk, ACL '19 "ratio" margin — the
    * criterion behind CCMatrix/LASER bitext mining, and the alignment-pair
    * miner of any two-corpus embedding space): raw cosine overrates hub
    * vectors that are close to EVERYTHING, so each candidate pair (x, y)
    * is rescored by its similarity relative to what x and y score against
    * their own neighborhoods —
    *
    *   margin(x, y) = cos(x, y) / ((meanₖ(x→tgt) + meanₖ(y→src)) / 2)
    *
    * and only the best-margin partner of each source vector survives, with
    * the standard ≥ 1.05 acceptance threshold emitted as a flag. Margins
    * genuinely rerank (the denominator depends on y), so this is NOT
    * top-1-by-cosine.
    *
    * Float discipline: sims are the 4-dp-rounded engine-portable cosines
    * ([[bruteForceTopK]]); neighborhood means fold in cand-id order (the
    * q81 0.0-init identity) and divide by the actual neighbor COUNT; the
    * margin is one fixed-tree IEEE expression over those — bit-identical
    * in the oracle, so the raw margin is emitted.
    *
    * Scale shape: the margin layer consumes two bounded (query, cand, sim)
    * top-k frames — O(|src|·k + |tgt|·k) rows — checkpointed once for
    * their two consumers (mean + rerank); the rerank itself is equi-joins
    * on the vector ids plus the bounded TopK aggregator. The candidate
    * GENERATOR is a parameter with the [[bruteForceTopK]] contract
    * (corpus, queries, idCol, vecCol, k) → (query_id, cand_id, sim):
    * brute force by default (exact, broadcast query side — the oracle's
    * replayable baseline); at 100 TB both directions swap in the IVF
    * shortlist generator via [[marginMineIvf]] (the q143/q144 pattern)
    * and the margin layer is unchanged. */
  def marginMine(src: DataFrame, tgt: DataFrame, idCol: String,
                 vecCol: String, k: Int, threshold: Double = 1.05,
                 generator: (DataFrame, DataFrame, String, String, Int) => DataFrame =
                   bruteForceTopK(_, _, _, _, _)): DataFrame = {
    val fwd = Dedup.checkpointStripped(
      generator(tgt, src, idCol, vecCol, k))
    val bwd = Dedup.checkpointStripped(
      generator(src, tgt, idCol, vecCol, k))
    def meanSim(nn: DataFrame, out: String) = nn.groupBy(col("query_id"))
      .agg((aggregate(
        sort_array(collect_list(struct(col("cand_id"), col("sim")))),
        lit(0.0d), (a, x) => a + x.getField("sim"))
        / count(lit(1)).cast("double")).as(out))
    val mf = meanSim(fwd, "_mf")
    val mb = meanSim(bwd, "_mb").withColumnRenamed("query_id", "cand_id")
    val pr = fwd.join(mf, "query_id").join(mb, "cand_id")
      .withColumn("margin",
        col("sim") / ((col("_mf") + col("_mb")) / lit(2.0)))
    TopK.topKPerGroup(pr, "query_id", "cand_id", "margin", 1)
      .join(fwd, Seq("query_id", "cand_id"))
      .select(col("query_id"), col("cand_id"), col("sim"), col("margin"),
        when(col("margin") >= lit(threshold), 1).otherwise(0)
          .cast("int").as("accepted"))
  }

  /** [[marginMine]] with the IVF shortlist generator — the 100 TB shape:
    * each direction builds its own coarse-quantizer index over its corpus
    * side (the CCMatrix deployment: source and target corpora are indexed
    * independently) and probes `nprobe` of `nlist` lists, so candidate
    * generation is an equi-join keyed on list_id — each corpus vector
    * meets only the queries probing its list, a 1/(nlist/nprobe) slice of
    * the brute all-pairs comparison volume ([[ivfTopK]] broadcast-hints
    * the probe side; when the mined corpora outgrow the broadcast
    * threshold, dropping the hint turns the same plan into a shuffle hash
    * join on list_id with AQE skew-splitting hot lists); the margin layer
    * is byte-identical to the brute path. Recall contract: with
    * nprobe = nlist the probe set covers
    * every list, the candidate set equals all non-self pairs, and the
    * result is EXACTLY [[marginMine]]'s (the ExtSpec law); with
    * nprobe < nlist the shortlist can miss true neighbors and the miss
    * rate is measurable with the q152 audit idiom. */
  def marginMineIvf(src: DataFrame, tgt: DataFrame, idCol: String,
                    vecCol: String, k: Int, threshold: Double = 1.05,
                    nlist: Int = 16, nprobe: Int = 4): DataFrame =
    marginMine(src, tgt, idCol, vecCol, k, threshold,
      (c, q, id, vc, kk) => ivfTopK(c, q, id, vc, kk, nlist, nprobe))

  /** k-NN majority-vote classification audit — the cheapest semi-supervised
    * quality-labeler over an embedding corpus (the data-level analogue of a
    * FineWeb-Edu-style classifier pass: propagate curator labels to the
    * unlabeled pool by neighborhood vote) run here as a HELD-OUT audit:
    * every probe vector carries its true label, so the output is the
    * per-vector confusion record (pred vs truth) an embedding-quality
    * report aggregates. Majority with smallest-label tie-break, both
    * engine-deterministic.
    *
    * Scale shape: neighbor lists are the bounded TopK frames (O(probes·k));
    * the label join keys on the candidate id (fact-scale equi-join); votes
    * aggregate map-side on (probe, label); the vote winner reuses the
    * bounded TopK aggregator — no windows anywhere. The neighbor GENERATOR
    * is a parameter with the [[bruteForceTopK]] contract: brute force by
    * default (the oracle's replayable baseline); [[knnClassifyIvf]] swaps
    * in the IVF shortlist at scale. */
  def knnClassify(labeled: DataFrame, probes: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int,
                  generator: (DataFrame, DataFrame, String, String, Int) => DataFrame =
                    bruteForceTopK(_, _, _, _, _)): DataFrame = {
    // null-labeled rows can neither vote nor occupy a neighbor slot
    // (Scored.id is a primitive long) — excluded before the k-NN search
    val lab = labeled.filter(col(labelCol).isNotNull)
    val nn = Dedup.checkpointStripped(
      generator(lab, probes, idCol, vecCol, k))
    val votes = nn
      .join(lab.select(col(idCol).as("cand_id"),
        col(labelCol).cast("long").as("_lbl")), "cand_id")
      .groupBy(col("query_id"), col("_lbl"))
      .agg(count(lit(1)).as("n_votes"))
    TopK.topKPerGroup(
        votes.withColumn("_sc", col("n_votes").cast("double")),
        "query_id", "_lbl", "_sc", 1)
      .join(probes.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("true_label")), "query_id")
      .select(col("query_id").as(idCol),
        col("_lbl").as("pred_label"),
        col("_sc").cast("long").as("n_votes"),
        col("true_label"),
        when(col("_lbl") === col("true_label"), 1).otherwise(0)
          .cast("int").as("correct"))
  }

  /** [[knnClassify]] with the IVF shortlist generator (see
    * [[marginMineIvf]] for the recall contract): the labeled pool is
    * indexed once, probes shortlist via nprobe lists — label propagation
    * over a 100 TB pool without the broadcast all-pairs pass. nprobe =
    * nlist reproduces [[knnClassify]] exactly (the ExtSpec law). */
  def knnClassifyIvf(labeled: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, labelCol: String, k: Int,
                     nlist: Int = 16, nprobe: Int = 4): DataFrame =
    knnClassify(labeled, probes, idCol, vecCol, labelCol, k,
      (c, q, id, vc, kk) => ivfTopK(c, q, id, vc, kk, nlist, nprobe))

  /** All-pairs near-duplicate detection by cosine threshold, bounded to ids <
    * maxId (at scale, run on LSH-bucket candidates instead of all pairs). */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, maxId: Long): DataFrame = {
    val e = emb.filter(col(idCol) < maxId)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))
    e.select(col(idCol).as("vec_a"), col("v").as("va"), col("nrm").as("na"))
      .join(e.select(col(idCol).as("vec_b"), col("v").as("vb"), col("nrm").as("nb")),
        col("vec_a") < col("vec_b"))
      .withColumn("cos", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Near-duplicate pairs via sign-LSH buckets — the unbounded scale path
    * for [[nearDupPairs]]: candidates are only in-bucket pairs (a bucket
    * equi-join, AQE-skew-safe), never all pairs, so it runs over the whole
    * corpus with no id bound. Recall: a pair is surfaced iff both vectors
    * share a bucket (multi-probe or band-OR would raise recall; one bucket
    * per vector keeps the construction oracle-exact). */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"),
        signBuckets(col(vecCol), planes).as("bucket"))
      .withColumn("nrm", l2norm(col("v")))
    e.select(col(idCol).as("vec_a"), col("v").as("va"), col("nrm").as("na"), col("bucket"))
      .join(e.select(col(idCol).as("vec_b"), col("v").as("vb"), col("nrm").as("nb"),
          col("bucket").as("_b2")),
        col("bucket") === col("_b2") && col("vec_a") < col("vec_b"))
      .withColumn("cos", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), col("bucket"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Band-OR near-duplicate pairs — the standard recall lever over
    * [[lshNearDupPairs]]: `bands` independent sign-LSH tables (distinct
    * md5-seeded plane sets), a pair is a candidate if it collides in ANY
    * band, then one exact cosine verify per distinct pair. Collision
    * probability rises from s^p to 1-(1-s^p)^bands (s = 1 - angle/pi) at the
    * cost of `bands` narrow self-joins.
    *
    * Scale shape: all band buckets are computed in ONE pass over the corpus
    * (map-side literal-plane projection; the per-vector intermediate is
    * (id, bands ints) — vectors are NOT carried), each band is a bucket
    * equi-join on that narrow frame, and the union dedups through a
    * (vec_a, vec_b) groupBy whose count is the surfaced `n_bands`. Vectors
    * re-enter only for the final verify, keyed by id. */
  def bandedNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bands: Int = 3, planesPerBand: Int = 6,
                         dim: Int = 64): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val bucketCols = (0 until bands).map(b =>
      signBuckets(col(vecCol), hyperplanes(planesPerBand, dim, s"graft:b$b")).as(s"bk_$b"))
    val bk = emb.select((col(idCol) +: bucketCols): _*)
    val perBand = (0 until bands).map { b =>
      bk.select(col(idCol).as("vec_a"), col(s"bk_$b").as("bk"))
        .join(bk.select(col(idCol).as("vec_b"), col(s"bk_$b").as("bk2")),
          col("bk") === col("bk2") && col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"))
    }
    val cands = perBand.reduce(_ unionByName _)
      .groupBy("vec_a", "vec_b").agg(count(lit(1)).as("n_bands"))
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", l2norm(col("v")))
    cands
      .join(e.select(col(idCol).as("vec_a"), col("v").as("va"), col("nrm").as("na")), "vec_a")
      .join(e.select(col(idCol).as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), "vec_b")
      .withColumn("cos", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") > threshold)
      .select(col("vec_a"), col("vec_b"), col("n_bands"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Connectivity-exact spanning-forest variant of [[bandedNearDupPairs]]
    * (r15 verdict #5 — the q191 scale path): per band BUCKET, an in-memory
    * union-find over the verified (cosine > threshold) pairs emits only the
    * SPANNING edges. Per bucket, the spanning forest of the verified pair
    * graph has exactly that graph's connected components; unioned over
    * buckets and bands, the emitted edge set therefore has exactly the same
    * transitive closure as the full [[bandedNearDupPairs]] output — the
    * ExtSpec law pins clusters(forest) ≡ clusters(full pairs)
    * cluster-for-cluster on the real corpus, and the q201 oracle re-proves
    * it per run (DuckDB closes over the FULL detector while Spark runs the
    * forest). Anything consuming only CONNECTIVITY (cluster routing,
    * leakage-free splits) can take this operator verbatim; per-pair
    * consumers (n_bands counts, cosine columns) still need the full one.
    *
    * Scale shape vs. the full detector: the full path materializes every
    * within-bucket pair — quadratic in duplicate-group size — and shuffles
    * it through a pair-keyed groupBy plus TWO embedding joins before the
    * cosine filter. Here the ONLY shuffle is n·bands (bucket, id, vector)
    * rows; pair enumeration happens inside each bucket's task, cosines are
    * computed ONLY for pairs not already connected (a duplicate clique of
    * size m costs m−1 verifications instead of m²), and the output is at
    * most (bucket size − 1) edges per bucket, so the downstream CC loop
    * stops scaling with dup-group size squared. Known skew limit: one hot
    * bucket is one task's CPU (no shuffle amplification — the enumeration
    * is in-memory); a production deployment pairs this with a bucket-size
    * alarm rather than salting, because sub-bucket salting would break
    * within-bucket connectivity.
    *
    * NaN rule: Spark's comparison ordering treats NaN as greater than every
    * double, so a zero-norm cosine passes `> threshold` there — mirrored
    * here (`cos.isNaN` keeps) so the law holds on any input. */
  def bandedNearDupForest(emb: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, bands: Int = 3,
                          planesPerBand: Int = 6, dim: Int = 64): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val spark = emb.sparkSession
    import spark.implicits._
    val bucketCols = (0 until bands).map(b =>
      signBuckets(col(vecCol), hyperplanes(planesPerBand, dim, s"graft:b$b")).as(s"bk_$b"))
    val keyed = emb
      .select(col(idCol).cast("long").as("_id") +:
        col(vecCol).cast("array<double>").as("_v") +: bucketCols: _*)
      .select(col("_id"), col("_v"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), col(s"bk_$b").as("bk"))): _*)).as("_g"))
      .select(col("_g.band").as("_band"), col("_g.bk").as("_bk"),
        col("_id"), col("_v"))
      .as[(Int, Int, Long, Array[Double])]
    keyed.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_: (Int, Int), it: Iterator[(Int, Int, Long, Array[Double])]) =>
        val ms = it.toArray.sortBy(_._3) // id order: deterministic edges
        val n = ms.length
        val ids = ms.map(_._3)
        val vs = ms.map(_._4)
        val norms = vs.map { v =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i) * v(i); i += 1 }
          math.sqrt(s)
        }
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x
          while (parent(r) != r) r = parent(r)
          var c = x
          while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val ri = find(i)
            val rj = find(j)
            // duplicate-id rows are the SAME vertex: merge them without
            // emitting (a self-loop (x, x) is an edge the full detector's
            // `vec_a < vec_b` join can never produce, and would break the
            // clusters(forest) ≡ clusters(full) law on dirty ingestion) —
            // merging unverified is exact: the full detector emits (x, y)
            // for both copies' neighbours, so their neighbourhoods share a
            // component there too
            if (ri != rj && ids(i) == ids(j)) parent(rj) = ri
            else if (ri != rj) {
              val a = vs(i)
              val b = vs(j)
              val len = math.min(a.length, b.length)
              var d = 0.0
              var k = 0
              // index-order accumulation — the DotProduct kernel's order,
              // so the verdicts are bit-identical to the full detector's
              while (k < len) { d += a(k) * b(k); k += 1 }
              val cos = d / (norms(i) * norms(j))
              if (cos > threshold || cos.isNaN) {
                parent(rj) = ri
                out += ((ids(i), ids(j)))
              }
            }
            j += 1
          }
          i += 1
        }
        out.iterator
      }
      .toDF("vec_a", "vec_b")
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
  def signBuckets(vecCol: Column, planes: Seq[Array[Double]]): Column =
    graft.functions.SignBuckets.signBuckets(vecCol.cast("array<double>"), planes)

  /** IVF-style ANN top-k: a coarse quantizer assigns every vector to its
    * nearest of `nlist` centroids (the "inverted lists"); a query probes its
    * `nprobe` closest lists and exact-re-ranks only those candidates.
    *
    * Index build: centroids are a deterministic pseudo-random sample — the
    * first `nlist` corpus vectors in md5(id) order (hash order ≡ uniform
    * sample, reproducible in any engine). They are collected to the driver
    * (nlist·dim doubles — the FAISS-style in-memory coarse quantizer) and
    * embedded as plan literals, so assignment is a pure map-side projection:
    * no shuffle, no per-row join against a centroid table. Real deployments
    * refine centroids with Lloyd iterations (each = one map-side assign +
    * one groupBy-average shuffle); the sampling init is the deterministic,
    * oracle-checkable instance of the same structure.
    *
    * Scale shape: candidate generation is an equi-join on list_id (shuffle
    * keyed on ≤ nlist values — AQE skew-splits hot lists), and the re-rank
    * is the bounded [[TopK]] aggregation, so the shuffle carries
    * O(queries·k), never all pairs. */
  /** Top-n centroid ids by (rounded cosine sim, id) desc — the fused
    * [[graft.functions.NearestCentroids]] kernel: one codegen unit per row
    * instead of nlist unrolled dot-product projections. */
  private def nearestIds(cents: Array[(Long, Array[Double])], v: Column, n: Int): Column =
    graft.functions.NearestCentroids.nearestCentroids(v, cents.toSeq, n)

  /** IVF index-maintenance audit (round-15; FAISS operational practice):
    * an IVF index is trained ONCE on the corpus it was built from, then
    * new shards stream into its FROZEN lists — and the question a
    * production vector store actually alarms on is "has the incoming
    * distribution drifted enough to re-train the coarse quantizer?".
    * Per frozen list: the index occupancy, the new shard's occupancy
    * under the SAME frozen centroids, and the share drift in exact basis
    * points — |n_new·T_index − n_index·T_new| scaled by 10⁴ over
    * T_index·T_new, every product in DECIMAL(38,0) (count pairs overflow
    * BIGINT beyond ~3·10⁹ rows/side — the [[graft.ext.Dedup
    * .histogramDrift]] precedent), division last, so the oracle replays
    * exactly. Lists the shard never touches report n_new = 0 — an
    * emptying list is itself drift signal, so the frame is seeded from
    * the centroid set, not from observed assignments.
    *
    * Scale shape: centroids are the deterministic bounded sample (the
    * [[ivfTopK]] idiom — nlist rows collected, shipped as literals into
    * the [[graft.functions.NearestCentroids]] kernel), both assignment
    * passes are map-side with map-side-combined (list) counts — the
    * shuffled key space is nlist, corpus-size-independent — and the
    * totals ride the constant-key bounded window over the nlist-row
    * frame. Cost scales with |index| + |shard| scans; nothing quadratic,
    * nothing driver-side beyond the nlist-row collect. */
  def ivfMaintenanceAudit(index: DataFrame, shard: DataFrame, idCol: String,
                          vecCol: String, nlist: Int = 16): DataFrame = {
    require(index.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"ivfMaintenanceAudit: id column '$idCol' must be LongType, got " +
        s"${index.schema(idCol).dataType.simpleString} — cast it upstream")
    val ei = ensureSlots(index.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v")))
    val es = shard.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"))
    val cents: Array[(Long, Array[Double])] = ei
      .orderBy(md5(col("_id").cast("string").cast("binary")))
      .limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def occupancy(df: DataFrame, out: String) = df
      .withColumn("list_id", element_at(nearestIds(cents, col("_v"), 1), 1))
      .groupBy(col("list_id")).agg(count(lit(1)).as(out))
    import ei.sparkSession.implicits._
    val lists = cents.map(_._1).toSeq.toDF("list_id")
    val one = substring(col("list_id").cast("string"), 0, 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(one)
    val dec = "decimal(38,0)"
    lists
      .join(occupancy(ei, "n_index"), Seq("list_id"), "left")
      .join(occupancy(es, "n_new"), Seq("list_id"), "left")
      .na.fill(0L, Seq("n_index", "n_new"))
      .withColumn("_ti", sum(col("n_index")).over(w))
      .withColumn("_tn", sum(col("n_new")).over(w))
      .withColumn("share_drift_bp",
        expr(s"(cast(10000 as $dec) * abs(cast(n_new as $dec) * _ti - " +
          s"cast(n_index as $dec) * _tn)) div " +
          s"(cast(greatest(_ti, 1) as $dec) * greatest(_tn, 1))").cast("long"))
      .select(col("list_id"), col("n_index"), col("n_new"),
        col("share_drift_bp"))
  }

  /** Lloyd refinement of the coarse quantizer: each iteration assigns every
    * vector to its nearest centroid (map-side, literal centroids) and
    * re-centers each list on the member mean — one shuffle of nlist·dim
    * map-side-combined partials (dim separate avg aggregates, NOT an
    * explode), then a nlist-row collect. Empty lists keep their centroid. */
  private def refineCentroids(e: DataFrame, cents0: Array[(Long, Array[Double])],
                              iterations: Int): Array[(Long, Array[Double])] = {
    val dim = cents0.head._2.length
    var cents = cents0
    (0 until iterations).foreach { _ =>
      val assigned = e
        .withColumn("_list", element_at(nearestIds(cents, col("_v"), 1), 1))
      val aggs = (0 until dim).map(i => avg(element_at(col("_v"), i + 1)).as(s"m$i"))
      val means = assigned.groupBy(col("_list")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> Array.tabulate(dim)(i => r.getDouble(i + 1)))
        .toMap
      cents = cents.map { case (cid, cv) => (cid, means.getOrElse(cid, cv)) }
    }
    cents
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              lloydIterations: Int = 0): DataFrame = {
    // the centroid sample and inverted-list ids are read as Long — fail fast
    // on misuse instead of a ClassCastException deep in the sample collect
    require(corpus.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"ivfTopK: id column '$idCol' must be LongType, got " +
        s"${corpus.schema(idCol).dataType.simpleString} — cast it upstream")
    val e = ensureSlots(corpus.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v")))
    // the Lloyd path runs 1 + iterations full-corpus actions (sample, then
    // one assignment+means pass per iteration) — cache the projected
    // embeddings for the duration so each pass reads memory blocks, not the
    // source scan again (at corpus scale the re-scan dominates the loop)
    val eCached = if (lloydIterations > 0)
      e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else e
    // unpersist on the failure path: if the sample action or a Lloyd pass
    // throws, nobody ever consumes the cached projection, so letting the
    // persist outlive the exception would leak MEMORY_AND_DISK blocks until
    // session teardown (the success-path persist DOES outlive the call —
    // see below)
    val cents =
      try {
        val sample: Array[(Long, Array[Double])] = eCached
          .orderBy(md5(col("_id").cast("string").cast("binary")))
          .limit(nlist)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        if (lloydIterations > 0) refineCentroids(eCached, sample, lloydIterations)
        else sample
      } catch { case ex: Throwable =>
        if (lloydIterations > 0) eCached.unpersist(blocking = false)
        throw ex
      }

    // final bucketing reads the SAME projected frame the Lloyd passes
    // cached (r9, VERDICT #5): the candidate side is exactly e's projection
    // renamed, so with lloydIterations > 0 it scans memory blocks instead
    // of a fresh source scan — at corpus scale that re-scan was the last
    // full pass not served from cache. The persist deliberately outlives
    // this call (the returned frame is lazy); the caller's session hygiene
    // (bench quiesce / session teardown) reclaims the blocks, which are a
    // 2-column projected slice at MEMORY_AND_DISK.
    val c = eCached.select(col("_id").as("cand_id"), col("_v").as("cv"))
      .withColumn("cn", l2norm(col("cv")))
      .withColumn("list_id", element_at(nearestIds(cents, col("cv"), 1), 1))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .withColumn("probe", explode(nearestIds(cents, col("qv"), nprobe)))
    val sims = c.join(broadcast(q),
        col("list_id") === col("probe") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4).as("sim"))
    TopK.topKPerGroup(sims, "query_id", "cand_id", "sim", k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** Multi-probe sign-LSH ANN: each query probes its own bucket AND the
    * bucket at Hamming distance 1 from flipping its lowest-margin plane —
    * the plane whose dot product is closest to zero is the likeliest bit to
    * differ for a true neighbor (the LSH multi-probe idea). Roughly doubles
    * candidate recall for one extra probe per query; candidate generation
    * stays a bucket equi-join and the re-rank stays the bounded TopK.
    *
    * The probe set is computed with per-plane dot columns on the (small)
    * query side only; the corpus side keeps the fused
    * [[graft.functions.SignBuckets]] kernel. */
  def annTopKMultiProbe(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, numPlanes: Int = 8,
                        dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("cv"),
      signBuckets(col(vecCol), planes).as("bucket"))
      .withColumn("cn", l2norm(col("cv")))
    val dps = array(planes.map(p => dot(col("qv"), typedLit(p.toSeq))): _*)
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .withColumn("qbucket", signBuckets(col("qv"), planes))
      .withColumn("_absdps", transform(dps, x => abs(x)))
      // 1-based index of the minimum |dot| — the least-confident sign bit
      .withColumn("_weak",
        array_position(col("_absdps"), array_min(col("_absdps"))).cast("int"))
      .withColumn("probe",
        explode(array(col("qbucket"), expr("qbucket ^ shiftleft(1, _weak - 1)"))))
    val sims = c.join(broadcast(q),
        col("bucket") === col("probe") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4).as("sim"))
    TopK.topKPerGroup(sims, "query_id", "cand_id", "sim", k)
      .select(col("query_id"), col("cand_id"), col("sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    * 2303.09540): cluster the embedding space with the same deterministic
    * coarse quantizer as [[ivfTopK]] (md5-ordered sample → map-side
    * nearest-centroid assignment), then drop, within each cluster, every
    * vector that has a strictly-smaller-id cluster-mate above the cosine
    * threshold (keep-min-id — the paper keeps one arbitrary member per
    * ε-ball; min-id is the deterministic instance).
    *
    * Scale shape: the only corpus-scale operations are the map-side
    * assignment (literal centroids, no shuffle) and ONE self-equi-join
    * keyed on list_id. Per-cluster work is quadratic BY DESIGN — SemDeDup's
    * premise is that nlist grows with the corpus (the paper uses 50k
    * clusters for LAION) so cluster size stays bounded; hot lists are AQE
    * skew-split. The drop set is O(corpus) on a duplicate-heavy crawl, so
    * the keep-one anti-join is a shuffled hash join, deliberately NOT
    * broadcast (the q53 lesson). */
  def semDeDup(emb: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nlist: Int = 16): DataFrame = {
    require(emb.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"semDeDup: id column '$idCol' must be LongType, got " +
        s"${emb.schema(idCol).dataType.simpleString} — cast it upstream")
    val e = emb.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
    val cents: Array[(Long, Array[Double])] = e
      .orderBy(md5(col("_id").cast("string").cast("binary")))
      .limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val lists = e
      .withColumn("_n", l2norm(col("_v")))
      .withColumn("list_id", element_at(nearestIds(cents, col("_v"), 1), 1))
    val a = lists.select(col("list_id"), col("_id").as("a_id"),
      col("_v").as("av"), col("_n").as("an"))
    val dropped = a.join(
        lists.select(col("list_id"), col("_id").as("b_id"),
          col("_v").as("bv"), col("_n").as("bn")),
        Seq("list_id"))
      .filter(col("a_id") < col("b_id") &&
        cosineFromNorms(dot(col("av"), col("bv")), col("an"), col("bn")) > threshold)
      .select(col("b_id")).distinct()
    lists
      .join(dropped.withColumnRenamed("b_id", "_id").withColumn("_drop", lit(true)),
        Seq("_id"), "left")
      .select(col("_id").as("vec_id"), col("list_id"),
        col("_drop").isNull.as("kept"))
  }

  /** [[semDeDup]] with the keeper rule real corpus curation uses (FineWeb /
    * SemDeDup §4 practice): in a near-duplicate pair, drop the LOWER-QUALITY
    * member — id is only the tie-break — so the surviving representative of
    * each duplicate neighborhood is its best document, not its accidental
    * min-id one. Dominance per above-threshold pair: the loser is the side
    * with the smaller (quality, −id) — i.e. lower quality, and on an exact
    * quality tie the larger id, which makes CONSTANT quality reduce this
    * operator to [[semDeDup]]'s keep-min-id exactly (the ExtSpec law).
    * Like keep-min-id, dominance is per-pair, not per-component: a doc
    * dropped by a better neighbor still drops ITS worse neighbors (the same
    * transitivity behavior q60 has — a chain keeps only local maxima).
    * Quality must be an engine-exact column (the q27 composite is proven
    * bit-identical; integers trivially so) — dominance compares it raw.
    * A NULL quality ranks strictly WORSE than any real score (it loses to
    * every scored neighbor; two null-quality duplicates fall back to the
    * id tie-break), so unscored documents never displace scored ones.
    *
    * Scale shape: identical to [[semDeDup]] — map-side assignment against
    * literal centroids, ONE list-keyed self-equi-join (AQE skew-split),
    * quality rides the existing row (no extra join), drop set anti-joined
    * without broadcast. */
  def semDeDupKeepBest(emb: DataFrame, idCol: String, vecCol: String,
                       qualityCol: String, threshold: Double,
                       nlist: Int = 16): DataFrame = {
    require(emb.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"semDeDupKeepBest: id column '$idCol' must be LongType, got " +
        s"${emb.schema(idCol).dataType.simpleString} — cast it upstream")
    val e = emb.select(col(idCol).as("_id"),
      col(vecCol).cast("array<double>").as("_v"),
      col(qualityCol).cast("double").as("_q"))
    val cents: Array[(Long, Array[Double])] = e
      .orderBy(md5(col("_id").cast("string").cast("binary")))
      .limit(nlist)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val lists = e
      .withColumn("_n", l2norm(col("_v")))
      .withColumn("list_id", element_at(nearestIds(cents, col("_v"), 1), 1))
    val a = lists.select(col("list_id"), col("_id").as("a_id"),
      col("_v").as("av"), col("_n").as("an"), col("_q").as("aq"))
    val dropped = a.join(
        lists.select(col("list_id"), col("_id").as("b_id"),
          col("_v").as("bv"), col("_n").as("bn"), col("_q").as("bq")),
        Seq("list_id"))
      .filter(col("a_id") < col("b_id") &&
        cosineFromNorms(dot(col("av"), col("bv")), col("an"), col("bn")) > threshold)
      // the dominated side: lower quality loses; an exact tie loses the
      // larger id (b, since a_id < b_id) — the keep-min-id degeneration.
      // NULL quality ranks WORST (ADVICE r14): a bare `aq < bq` is null
      // when aq is null, which would fire the otherwise-branch and drop
      // the side WITH a real score — so the null side is named the loser
      // explicitly, and a double-null pair falls back to the id tie-break.
      .select(when(col("aq").isNull && col("bq").isNotNull, col("a_id"))
        .when(col("aq") < col("bq"), col("a_id"))
        .otherwise(col("b_id")).as("_id"))
      .distinct()
    lists
      .join(dropped.withColumn("_drop", lit(true)), Seq("_id"), "left")
      .select(col("_id").as("vec_id"), col("list_id"), col("_q").as("quality"),
        col("_drop").isNull.as("kept"))
  }

  /** Product-quantization ANN top-k (Jégou, Douze & Schmid, TPAMI '11 —
    * the PQ/ADC construction behind FAISS's `IndexPQ`): the compressed-
    * domain completion of the quantization story begun by [[quantizeInt8]]
    * and [[ivfTopK]]. Vectors are globally int8-quantized (ONE corpus-wide
    * scale, so quantized distances are comparable across vectors), split
    * into `m` subvectors, and each subvector is encoded as the index of its
    * nearest codebook centroid — the corpus is then searched WITHOUT
    * touching float vectors: a query precomputes, per subquantizer, its
    * distance to every centroid (the ADC lookup table), the scan sums m
    * table lookups per candidate, and only the `shortlist` best ADC
    * candidates get an exact float cosine re-rank.
    *
    * Codebooks are the deterministic hash-sample idiom of [[ivfTopK]]: the
    * `ksub` corpus vectors first in md5(id) order, quantized IN the engine
    * (so round semantics are engine-exact), subvector-sliced. Real
    * deployments refine per-subquantizer centroids with k-means; the
    * sampling init is the deterministic, oracle-checkable instance of the
    * same structure. All encode/ADC arithmetic is INTEGER (squared L2 in
    * int8 space — bounded by m·subDim·254² < 2^23), so codes, lookup
    * tables and ADC distances replay bit-for-bit relationally; floats
    * appear only in the final rounded re-rank, the established engine
    * boundary.
    *
    * Scale shape: code assignment and the ADC scan are pure map-side
    * expression projections against plan-literal codebooks and a BROADCAST
    * query-side LUT frame (the corpus never shuffles); the shortlist is the
    * bounded [[TopK]] aggregation carrying O(queries·shortlist) rows; the
    * re-rank re-enters float vectors by id for shortlist ids only. The two
    * driver collects (global max-abs, ksub sample) are the bounded-artifact
    * tier of the IVF centroids. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
             shortlist: Int = 20): DataFrame =
    pqImpl(corpus, queries, idCol, vecCol, k, m, ksub, shortlist,
      nlist = 0, nprobe = 0)

  /** IVF-PQ: [[pqTopK]]'s ADC scan gated by [[ivfTopK]]'s coarse quantizer
    * — FAISS `IndexIVFPQ` with `by_residual=false` (codes encode the raw
    * vectors, not per-list residuals; the residual rotation is a recall
    * refinement, not a structural change). The coarse stage assigns every
    * vector to its nearest of `nlist` md5-sampled centroids on the FLOAT
    * side (exactly [[ivfTopK]]'s assignment, same rounded-cosine argmax);
    * a query's ADC scan then touches only its `nprobe` probed lists, so at
    * 100 TB the scan reads nprobe/nlist of the code table instead of all
    * of it — and the code table is m bytes-ish per vector, not the
    * embedding. Shortlist and exact re-rank as in [[pqTopK]]. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
                shortlist: Int = 20, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"need 1 <= nprobe ($nprobe) <= nlist ($nlist)")
    pqImpl(corpus, queries, idCol, vecCol, k, m, ksub, shortlist, nlist, nprobe)
  }

  /** The PQ encode + ADC scan stage, up to (query_id, cand_id, adc_dist) —
    * private[graft] so PlanShapeSpec can pin the scan's join shape (the
    * final operator checkpoints the tiny re-rank frame, which truncates
    * this stage out of the public plan). */
  private[graft] def pqAdcFrame(corpus: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String, m: Int,
                                ksub: Int, nlist: Int, nprobe: Int): DataFrame = {
    require(corpus.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"pqTopK: id column '$idCol' must be LongType, got " +
        s"${corpus.schema(idCol).dataType.simpleString} — cast it upstream")
    val e = corpus.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
    // global symmetric scale — one scalar agg; per-vector scales would make
    // quantized distances incomparable across vectors
    val gmaxRow = e.agg(max(array_max(transform(col("_v"), x => abs(x))))).head()
    val gmax = if (gmaxRow.isNullAt(0)) 0.0 else gmaxRow.getDouble(0)
    val safe = if (gmax > 0) gmax / 127.0 else 1.0
    def quant(v: Column): Column = transform(v, x =>
      least(greatest(round(x / lit(safe)), lit(-127.0)), lit(127.0)).cast("int"))
    // codebooks: the md5-ordered sample's QUANTIZED vectors, quantized by
    // the engine itself so driver arithmetic can never drift from the plan
    val sample: Array[Array[Int]] = e
      .orderBy(md5(col("_id").cast("string").cast("binary"))).limit(ksub)
      .select(quant(col("_v")).as("_q"))
      .collect().map(_.getSeq[Int](0).toArray)
    require(sample.nonEmpty, "pqTopK: empty corpus — no codebook sample")
    val dim = sample.head.length
    require(dim % m == 0, s"pqTopK: dim $dim must be divisible by m=$m")
    // fused distance-matrix kernel ([[graft.functions.PqDistMatrix]]): ONE
    // plan node per side — the unrolled m·ksub·subDim expression form cost
    // ~8 s of Catalyst planning per execution, flat in data size
    def distMat(v: Column): Column =
      graft.functions.PqDistMatrix.pqDistMatrix(v, sample, m, safe)
    // optional coarse quantizer (IVF gating): the ivfTopK float-side
    // centroid sample + nearest-centroid assignment, as plan literals
    val cents: Array[(Long, Array[Double])] =
      if (nlist > 0)
        e.orderBy(md5(col("_id").cast("string").cast("binary"))).limit(nlist)
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      else Array.empty
    // corpus codes: the dist matrix materializes ONCE, then argmin per
    // subquantizer via array_position(array_min) — first index wins ties
    // (smaller centroid)
    val listCol =
      if (nlist > 0) Seq(element_at(nearestIds(cents, col("_v"), 1), 1).as("list_id"))
      else Seq.empty
    val coded = e
      .select((col("_id").as("cand_id") +: distMat(col("_v")).as("_dm") +:
        listCol): _*)
      .select((col("cand_id") +: (0 until m).map(mi =>
        (array_position(element_at(col("_dm"), mi + 1),
          array_min(element_at(col("_dm"), mi + 1))) - 1)
          .cast("int").as(s"code_$mi"))) ++ listCol.map(_ => col("list_id")): _*)
    // query-side ADC lookup tables (tiny frame, broadcast); with gating the
    // query also explodes its nprobe probed lists
    val qBase = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("_dm", distMat(col("qv")))
    val q =
      if (nlist > 0)
        qBase.select(col("query_id") +:
            explode(nearestIds(cents, col("qv"), nprobe)).as("probe") +:
            (0 until m).map(mi => element_at(col("_dm"), mi + 1).as(s"lut_$mi")): _*)
      else
        qBase.select(col("query_id") +:
          (0 until m).map(mi => element_at(col("_dm"), mi + 1).as(s"lut_$mi")): _*)
    val joinCond =
      if (nlist > 0) col("list_id") === col("probe") && col("cand_id") =!= col("query_id")
      else col("cand_id") =!= col("query_id")
    coded.join(broadcast(q), joinCond)
      .withColumn("adc_dist",
        (0 until m).map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi") + 1))
          .reduce(_ + _))
      .select(col("query_id"), col("cand_id"), col("adc_dist"))
  }

  private def pqImpl(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, m: Int, ksub: Int,
                     shortlist: Int, nlist: Int, nprobe: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val adc = pqAdcFrame(corpus, queries, idCol, vecCol, m, ksub, nlist, nprobe)
    pqFinish(adc, corpus, idCol, vecCol, k, shortlist)
  }

  /** Shared PQ tail: bounded ADC shortlist → checkpoint-once exact rounded
    * cosine re-rank → bounded top-k with the adc audit column. */
  private def pqFinish(adc: DataFrame, corpus: DataFrame, idCol: String,
                       vecCol: String, k: Int, shortlist: Int): DataFrame = {
    val e = corpus.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
    // bounded ADC shortlist (asc distance ≡ desc negated score, id ties asc)
    val short = TopK.topKPerGroup(
        adc.withColumn("_score", -col("adc_dist").cast("double")),
        "query_id", "cand_id", "_score", shortlist)
      .withColumn("adc_dist", (-col("_score")).cast("long"))
      .select(col("query_id"), col("cand_id"), col("adc_dist"))
    // exact float re-rank on the surviving candidates only; the re-ranked
    // frame is O(queries·shortlist) rows and feeds TWO consumers (the
    // bounded top-k and the adc join-back) — materialize it once instead of
    // executing the whole ADC pipeline twice (the q53 discipline)
    val vecs = e.withColumn("_n", l2norm(col("_v")))
    val rr = Dedup.checkpointStripped(short
      .join(vecs.select(col("_id").as("query_id"), col("_v").as("qv2"),
        col("_n").as("qn")), "query_id")
      .join(vecs.select(col("_id").as("cand_id"), col("_v").as("cv2"),
        col("_n").as("cn")), "cand_id")
      .withColumn("sim",
        round(cosineFromNorms(dot(col("qv2"), col("cv2")), col("qn"), col("cn")), 4))
      .select(col("query_id"), col("cand_id"), col("adc_dist"), col("sim")))
    TopK.topKPerGroup(rr.withColumnRenamed("sim", "_s"), "query_id", "cand_id", "_s", k)
      .join(rr.select(col("query_id"), col("cand_id"), col("adc_dist")),
        Seq("query_id", "cand_id"))
      .select(col("query_id"), col("cand_id"), col("adc_dist"), col("_s").as("sim"))
  }

  /** RESIDUAL IVF-PQ — FAISS `IndexIVFPQ`'s default `by_residual=true`,
    * completing the [[ivfPqTopK]] story: PQ codes encode the residual
    * v − centroid(list(v)) instead of the raw vector. Residuals of a
    * coherent list concentrate near the origin, so the SAME codebook
    * budget spends its resolution on the part of the vector the coarse
    * quantizer didn't already explain — the recall lever that justifies
    * the extra machinery: the query must now build ONE ADC lookup table
    * PER PROBED LIST (its residual differs per probe centroid), which is
    * why FAISS bounds nprobe.
    *
    * Determinism/oracle: the centroid map rides as a plan literal; the
    * residual is an exact IEEE subtraction (zip_with, index order), the
    * global residual scale and codebook-sample quantization reuse the
    * [[pqTopK]] discipline (engine-side HALF_UP, clamp ±127), and the
    * [[graft.functions.PqDistMatrix]] kernel does encode + LUT in one
    * node. Everything after the quantization boundary is exact integers.
    *
    * Scale shape: identical to [[ivfPqTopK]] — map-side assignment +
    * residual + kernel, one broadcast hash join on (list = probe) whose
    * broadcast side is queries×nprobe LUT rows, bounded shortlist,
    * checkpoint-once re-rank. Three bounded driver collects (coarse
    * sample, residual max, codebook sample). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
                        shortlist: Int = 20, nlist: Int = 16,
                        nprobe: Int = 4): DataFrame = {
    require(corpus.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"ivfPqResidualTopK: id column '$idCol' must be LongType, got " +
        s"${corpus.schema(idCol).dataType.simpleString} — cast it upstream")
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"need 1 <= nprobe ($nprobe) <= nlist ($nlist)")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val e = corpus.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
    val cents: Array[(Long, Array[Double])] = e
      .orderBy(md5(col("_id").cast("string").cast("binary"))).limit(nlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(cents.nonEmpty, "ivfPqResidualTopK: empty corpus")
    val cmap = map(cents.flatMap { case (cid, cv) =>
      Seq(lit(cid), typedLit(cv.toSeq)) }: _*)
    def residual(v: Column, listId: Column): Column =
      zip_with(v, element_at(cmap, listId), (a, b) => a - b)
    val eL = e
      .withColumn("list_id", element_at(nearestIds(cents, col("_v"), 1), 1))
      .withColumn("_r", residual(col("_v"), col("list_id")))
    val gmaxRow = eL.agg(max(array_max(transform(col("_r"), x => abs(x))))).head()
    val gmax = if (gmaxRow.isNullAt(0)) 0.0 else gmaxRow.getDouble(0)
    val safe = if (gmax > 0) gmax / 127.0 else 1.0
    def quant(v: Column): Column = transform(v, x =>
      least(greatest(round(x / lit(safe)), lit(-127.0)), lit(127.0)).cast("int"))
    val codebook: Array[Array[Int]] = eL
      .orderBy(md5(col("_id").cast("string").cast("binary"))).limit(ksub)
      .select(quant(col("_r")).as("_q"))
      .collect().map(_.getSeq[Int](0).toArray)
    val dim = codebook.head.length
    require(dim % m == 0, s"ivfPqResidualTopK: dim $dim must be divisible by m=$m")
    def dm(v: Column): Column =
      graft.functions.PqDistMatrix.pqDistMatrix(v, codebook, m, safe)
    val coded = eL
      .select(col("_id").as("cand_id"), dm(col("_r")).as("_dm"), col("list_id"))
      .select(col("cand_id") +: (0 until m).map(mi =>
        (array_position(element_at(col("_dm"), mi + 1),
          array_min(element_at(col("_dm"), mi + 1))) - 1)
          .cast("int").as(s"code_$mi")) :+ col("list_id"): _*)
    // per-(query, probe) residual → one LUT row per probe (tiny, broadcast)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("probe", explode(nearestIds(cents, col("qv"), nprobe)))
      .withColumn("_dm", dm(residual(col("qv"), col("probe"))))
      .select(col("query_id") +: col("probe") +:
        (0 until m).map(mi => element_at(col("_dm"), mi + 1).as(s"lut_$mi")): _*)
    val adc = coded.join(broadcast(q),
        col("list_id") === col("probe") && col("cand_id") =!= col("query_id"))
      .withColumn("adc_dist",
        (0 until m).map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi") + 1))
          .reduce(_ + _))
      .select(col("query_id"), col("cand_id"), col("adc_dist"))
    pqFinish(adc, corpus, idCol, vecCol, k, shortlist)
  }

  /** Cluster-quality audit in int8-quantized space — the "so what"
    * measurement for the clustering family (the q43/q45/q60 coarse
    * quantizer, the q144 IVF gate): per inverted list, how tight is the
    * cluster? Uses the mean-free sum-of-squares identity so every number
    * is EXACT INTEGER despite the mean being rational:
    *   n·WCSS = n·Σ_i ||q_i||² − Σ_d (Σ_i q_{i,d})²
    * (WCSS = within-cluster sum of squared L2 distance to the cluster
    * mean). Vectors are globally int8-quantized (ONE corpus scale, the
    * [[pqTopK]] convention) so sums and squares ride in long/DECIMAL(38,0)
    * and replay on HUGEINT. Reports one row per list plus a global row
    * (list_id = −1, the corpus-wide TSS·N): n, raw quantized energy `ssq`,
    * the exact `wcss_x_n`, and `dispersion_bp` = (10000·n·WCSS) div
    * (n·ssq) — the share of the cluster's raw energy that is variance
    * around its own mean (0 = all members identical; ≥ the global row's
    * value means the "cluster" is no tighter than the corpus).
    *
    * Scale shape: assignment is the map-side literal-centroid projection;
    * per-cluster sums are ONE map-side-combined aggregation with
    * nlist·(dim+2) bounded state (dim separate sum columns — no explode,
    * the [[refineCentroids]] idiom); everything after is arithmetic on
    * ≤ nlist+1 rows. */
  def clusterQualityInt8(emb: DataFrame, idCol: String, vecCol: String,
                         nlist: Int = 16): DataFrame = {
    require(emb.schema(idCol).dataType == org.apache.spark.sql.types.LongType,
      s"clusterQualityInt8: id column '$idCol' must be LongType, got " +
        s"${emb.schema(idCol).dataType.simpleString} — cast it upstream")
    val dec = "decimal(38,0)"
    val e = emb.select(col(idCol).as("_id"), col(vecCol).cast("array<double>").as("_v"))
    val gmaxRow = e.agg(max(array_max(transform(col("_v"), x => abs(x))))).head()
    val gmax = if (gmaxRow.isNullAt(0)) 0.0 else gmaxRow.getDouble(0)
    val safe = if (gmax > 0) gmax / 127.0 else 1.0
    val quant = transform(col("_v"), x =>
      least(greatest(round(x / lit(safe)), lit(-127.0)), lit(127.0)).cast("int"))
    val cents: Array[(Long, Array[Double])] = e
      .orderBy(md5(col("_id").cast("string").cast("binary"))).limit(nlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(cents.nonEmpty, "clusterQualityInt8: empty corpus")
    val dim = cents.head._2.length
    val assigned = e
      .withColumn("_q", quant)
      .withColumn("list_id", element_at(nearestIds(cents, col("_v"), 1), 1))
      .withColumn("_rssq", aggregate(col("_q"), lit(0L),
        (acc, x) => acc + x.cast("long") * x.cast("long")))
    val aggs = count(lit(1)).as("n") +: sum(col("_rssq")).as("ssq") +:
      (0 until dim).map(d => sum(element_at(col("_q"), d + 1).cast("long")).as(s"_s$d"))
    val per = assigned.groupBy(col("list_id")).agg(aggs.head, aggs.tail: _*)
    val glob = assigned.groupBy().agg(aggs.head, aggs.tail: _*)
      .withColumn("list_id", lit(-1L))
    val snorm = (0 until dim)
      .map(d => col(s"_s$d").cast(dec) * col(s"_s$d")).reduce(_ + _)
    per.unionByName(glob.select(per.columns.map(col): _*))
      .withColumn("_snorm", snorm)
      .withColumn("wcss_x_n",
        col("n").cast(dec) * col("ssq") - col("_snorm"))
      .withColumn("dispersion_bp",
        when(col("n") * col("ssq") > 0,
          expr(s"cast((10000 * wcss_x_n) div (cast(n as $dec) * ssq) as bigint)")))
      .select(col("list_id"), col("n"), col("ssq").cast("long").as("ssq"),
        col("wcss_x_n").cast("long").as("wcss_x_n"), col("dispersion_bp"))
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
      .withColumn("cn", l2norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      signBuckets(col(vecCol), planes).as("qbucket"))
      .withColumn("qn", l2norm(col("qv")))
    val sims = c.join(broadcast(q),
        col("bucket") === col("qbucket") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFromNorms(dot(col("qv"), col("cv")), col("qn"), col("cn")), 4).as("sim"))
    // bounded top-k re-rank (same tier as bruteForceTopK/ivfTopK): the
    // shuffle carries O(queries·k) rows even when a bucket is hot, where the
    // window form would shuffle every in-bucket (query, candidate) pair.
    // The candidate's bucket equals the query's by the join condition, so it
    // is recovered from the tiny broadcast query side after the aggregation.
    TopK.topKPerGroup(sims, "query_id", "cand_id", "sim", k)
      .join(broadcast(q.select(col("query_id"), col("qbucket").as("bucket"))), Seq("query_id"))
      .select(col("query_id"), col("cand_id"), col("bucket"), col("sim"))
  }
}
