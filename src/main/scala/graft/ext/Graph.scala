package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph-centrality over an edge list — the numeric-fixpoint
  * companion to the label-propagation loop in [[Dedup.duplicateClusters]].
  * PageRank here ranks near-duplicate HUB documents (which doc does every
  * other spelling of this page point at?) so canonical-selection can keep
  * the most central copy instead of min-id.
  *
  * All arithmetic is INTEGER fixed-point (ranks scaled by `scale`, damping
  * as a percentage, `div` floor division): floating-point summation order
  * differs run-to-run and engine-to-engine, but BIGINT arithmetic is exact
  * everywhere, so DuckDB replays the fixpoint bit-identically with an
  * unrolled CTE chain. Mass lost to integer floors is deterministic and
  * identical in both engines — this is a ranking, not a probability
  * distribution.
  *
  * Scale shape per iteration: one equi-join of the rank frame onto the edge
  * list (shuffles on the join key; AQE broadcast-promotes the rank frame
  * while it is small — it is O(nodes), the edge list is the big side) and
  * one map-side-combinable sum by destination. Plans are kept O(1) across
  * iterations by [[Dedup.checkpointStripped]] — the same stats-snowball
  * guard the CC loop needs (see NOTES round 6).
  */
object Graph {

  /** `iterations` rounds of damped PageRank over a DIRECTED edge list
    * (`srcCol`, `dstCol`). Every node must appear as a source at least once
    * (true for symmetric graphs like the near-dup pair graph); dangling-mass
    * redistribution is deliberately out of scope and documented as such.
    * Returns (node, rank) with rank on the fixed-point `scale`. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int, dampingPct: Int = 85,
                  scale: Long = 1000000000000L,
                  checkpointEvery: Int = 4): DataFrame = {
    require(scale % 100 == 0, "scale must be divisible by 100 for exact teleport mass")
    val teleport = scale / 100 * (100 - dampingPct)
    // materialize the edge list ONCE: every iteration's action re-executes
    // its upstream otherwise (a near-dup pair graph re-runs MinHash+LSH per
    // round — the q49 input-materialization lesson)
    val e = Dedup.checkpointStripped(edges.select(col(srcCol), col(dstCol)))
    val deg = e.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("outdeg"))
    var rank = deg.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iterations) {
      val contribs = rank.join(deg, "node")
        .join(e, col("node") === col(srcCol))
        .select(col(dstCol).as("node"), expr("rank div outdeg").as("share"))
        .groupBy(col("node")).agg(sum(col("share")).as("inflow"))
      val next = deg.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * coalesce(inflow, cast(0 as bigint))) div 100")).as("rank"))
      // checkpoint only every `checkpointEvery` rounds: un-checkpointed
      // rounds chain into ONE plan whose repeated deg/edge subtrees dedup
      // via ReuseExchange (one action instead of one per round — at
      // local[32] each eager checkpoint is ~0.3 s of pure driver latency),
      // while the periodic stripped checkpoint still bounds plan depth and
      // stats growth for large `iterations`
      rank = if (i % checkpointEvery == 0 && i < iterations)
        Dedup.checkpointStripped(next)
      else next
    }
    rank
  }

  /** Triangle census over an UNDIRECTED graph given as canonical pairs
    * (`aCol` < `bCol`, distinct). A triangle {x<y<z} is counted exactly once
    * by the oriented wedge join: edges (x,y)⋈(y,z) on the middle vertex,
    * closed by probing (x,z) — every edge list stays in ascending
    * orientation, so no pair is enumerated twice and no `DISTINCT` over
    * wedges is needed. Near-dup graphs are what this runs on here: a high
    * triangle density inside an LSH candidate set is the classic signal
    * that candidates are true duplicate CLIQUES rather than hash noise.
    *
    * Returns one row: (n_nodes, n_edges, n_triangles).
    *
    * Scale shape: two equi-joins over the PAIR graph (O(edges) and
    * O(wedges)), never over the corpus; the skew guard at real scale is
    * degree-ordering (orienting edges low-degree→high-degree), which this
    * canonical id orientation approximates for near-dup graphs whose hubs
    * are min-ids. */
  def triangleStats(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tri = wedges.join(e.as("e3"),
        col("x") === col("e3.a") && col("z") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** [[triangleStats]] with TRUE degree ordering — the adversarial-graph
    * form: every undirected edge is oriented from its lower-(degree, id)
    * endpoint to its higher one, so a hub of degree d contributes out-wedges
    * only for the (few) neighbours ranked above it, bounding any node's
    * out-degree by O(√edges) (the compact-forward bound; Latapy 2008) where
    * canonical-id orientation leaves a min-id hub with d²/2 wedges. Each
    * triangle then has exactly ONE node with out-degree 2 in it (its
    * order-minimum), so closing ordered out-pairs against the oriented edge
    * set counts every triangle exactly once — no DISTINCT, same census.
    *
    * Same output as [[triangleStats]]: one (n_nodes, n_edges, n_triangles)
    * row; the equivalence is property-tested on random graphs. Costs one
    * extra degree aggregation + join over the pair graph — worth it exactly
    * when the graph is hub-heavy. */
  def triangleStatsDegreeOrdered(pairs: DataFrame, aCol: String,
                                 bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("deg"))
    // (u → w) iff (deg u, u) < (deg w, w): a total order, so each
    // undirected edge appears exactly once, tagged with its head's rank key
    val or = sym
      .join(deg.select(col("v").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("_db")), Seq("b"))
      .filter(struct(col("_da"), col("a")) < struct(col("_db"), col("b")))
      .select(col("a").as("u"), col("b").as("w"),
        col("_db").as("dw"))
    // ordered out-pairs of each source close against the oriented edge
    // between the two heads (orientation agrees with the pair's order)
    val tri = or.as("p").join(or.as("q"),
        col("p.u") === col("q.u") &&
          struct(col("p.dw"), col("p.w")) < struct(col("q.dw"), col("q.w")))
      .select(col("p.w").as("x"), col("q.w").as("y"))
      .join(or.as("r"), col("x") === col("r.u") && col("y") === col("r.w"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edges).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
