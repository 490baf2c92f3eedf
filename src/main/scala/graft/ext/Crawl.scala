package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The crawl-ingest chain as ONE operator (q208 + its streaming twin —
  * one definition, so the batch query and the arrival-time loop can never
  * drift): WARC blobs → response bodies → HTTP 200 gate → doc id recovered
  * from the crawled URI → link-density boilerplate extraction
  * ([[Html.pageSummary]]).
  *
  * Per-page independence: a page's output row depends only on its own
  * record bytes — no corpus state, no cross-page joins — so ANY partition
  * of the blob set into micro-batches yields exactly the batch extraction
  * of the union (the [[graft.stream.StreamingCrawl]] ≡ batch law).
  */
object Crawl {

  /** One row per successfully fetched (HTTP 200) page in `blobs`:
    * doc_id, http_status, block/keep counts, char masses, boilerplate
    * basis points, extracted text. */
  def extract(blobs: Dataset[(Long, Array[Byte])], minLen: Int = 10): DataFrame =
    extractFrom(Warc.extractResponseBodies(blobs), minLen)

  /** The extraction chain from an ALREADY-WALKED response-bodies frame
    * (any frame carrying uri / http_status / body — the strict walk's
    * [[Warc.extractResponseBodies]] or the hostile-bytes recovering
    * walk's [[Warc.extractHostile]]): the container layer varies, the
    * 200 gate → id recovery → boilerplate extraction must not. `extra`
    * columns of the input ride the projection untouched (the
    * curatedDocs convention — the streaming hostile twin carries the
    * walk's per-blob loss columns through here). */
  def extractFrom(bodies: DataFrame, minLen: Int = 10,
                  extra: Seq[String] = Nil): DataFrame =
    bodies
      .filter(col("http_status") === 200)
      .select(Seq(
        regexp_extract(col("uri"), "/doc/([0-9]+)$", 1).cast("long")
          .as("doc_id"),
        col("http_status"),
        Html.blockStats(col("body")).as("_st")) ++ extra.map(col): _*)
      .select(Seq(col("doc_id"), col("http_status"),
        Html.pageSummary(col("_st"), minLen).as("_e")) ++ extra.map(col): _*)
      .select(Seq(col("doc_id"), col("http_status"),
        col("_e.n_blocks").as("n_blocks"),
        col("_e.n_kept").as("n_kept"),
        col("_e.kept_chars").as("kept_chars"),
        col("_e.total_chars").as("total_chars"),
        expr("CASE WHEN _e.total_chars > 0 THEN " +
          "(_e.total_chars - _e.kept_chars) * 10000L div _e.total_chars END")
          .as("boiler_bp"),
        col("_e.extracted").as("extracted")) ++ extra.map(col): _*)

  /** SITE-LEVEL template-block removal (Gibson–Punera–Tomkins,
    * "The volume and evolution of web page templates", WWW 2005; the
    * frequency method production extractors layer under per-page
    * heuristics): a block whose exact visible text recurs on a strict
    * MAJORITY of its host's pages is site furniture — nav bars, footers,
    * cookie banners — whatever its length or link density, which is
    * precisely the case the per-page rules (q204 link density, q241
    * stopword density) cannot see: a long, link-free, prose-like banner
    * repeated site-wide. Cross-PAGE evidence, so this is a corpus
    * operator, not a per-row expression.
    *
    * `pages` carries (host, doc_id, html). The block frame (one
    * [[Html.blockStats]] pass, position-exploded) is materialized ONCE
    * and feeds the host page counts, the per-(host, digest) frequency,
    * and the final re-join — the q53 single-materialization discipline.
    * Shuffles: the two rollups plus the digest re-join, all O(blocks);
    * per-host state is O(distinct blocks), never O(pages²).
    *
    * Returns per page: (doc_id, host, n_blocks, n_template, kept_chars,
    * extracted) — kept blocks rejoined in page order. */
  def siteTemplateExtract(pages: DataFrame): DataFrame = {
    val blocks = pages
      .select(col("host"), col("doc_id"),
        posexplode(Html.blockStats(col("html"))).as(Seq("ord", "_b")))
      .select(col("host"), col("doc_id"), col("ord"),
        col("_b.visible").as("visible"),
        col("_b.vis_len").as("vis_len"),
        md5(col("_b.visible")).as("digest"))
      .localCheckpoint()
    val hostPages = blocks.select(col("host"), col("doc_id")).distinct()
      .groupBy(col("host")).agg(count(lit(1)).as("host_pages"))
    val tmpl = blocks.select(col("host"), col("digest"), col("doc_id")).distinct()
      .groupBy(col("host"), col("digest"))
      .agg(count(lit(1)).as("n_pages"))
      .join(broadcast(hostPages), Seq("host"))
      .select(col("host"), col("digest"),
        (col("n_pages") * 2 > col("host_pages")).as("is_template"))
    blocks.join(tmpl, Seq("host", "digest"))
      .groupBy(col("doc_id"), col("host"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("is_template"), 1L).otherwise(0L)).as("n_template"),
        sum(when(!col("is_template"), col("vis_len").cast("long"))
          .otherwise(0L)).as("kept_chars"),
        array_join(transform(array_sort(collect_list(
            when(!col("is_template"), struct(col("ord"), col("visible"))))),
          s => s.getField("visible")), "\n").as("extracted"))
  }

  /** The q246–q250 link-graph edge extraction as ONE operator (batch
    * queries + [[graft.stream.StreamingLinkGraph]] — one definition, the
    * [[extract]] discipline): `docs` rows (doc_id, text) synthesize their
    * [[Html.linkPage]] markup (closed mod `n`), the GENERIC anchor
    * extractor parses it, and `/doc/K` hrefs become (src, dst) edges —
    * nav/footer paths fail the pattern at extraction, not synthesis.
    * Per-page independence: a page's out-edges depend only on its own
    * markup, so any micro-batch partition of the corpus extracts exactly
    * the batch edge set of the union. */
  def linkEdgesFrom(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id"),
        explode(Html.anchorPairs(
          Html.linkPage(col("doc_id"), lit(n), col("text")))).as("_a"))
      .select(col("doc_id").as("src"),
        regexp_extract(col("_a.href"), "^/doc/([0-9]+)$", 1).as("_k"))
      .filter(col("_k") =!= "")
      .select(col("src"), col("_k").cast("long").as("dst"))

  /** [[linkEdgesFrom]] carrying the ANCHOR-TEXT mass as the edge weight
    * (w = anchor char length, read from the REAL markup): the endorsement
    * signal weighted link analysis consumes — a link the page spends more
    * anchor text on carries more of its vote (the q205 anchor-corpus
    * signal, folded into the graph itself). */
  def linkEdgesWeighted(docs: DataFrame, n: Long): DataFrame =
    docs.select(col("doc_id"),
        explode(Html.anchorPairs(
          Html.linkPage(col("doc_id"), lit(n), col("text")))).as("_a"))
      .select(col("doc_id").as("src"),
        regexp_extract(col("_a.href"), "^/doc/([0-9]+)$", 1).as("_k"),
        length(col("_a.anchor")).cast("long").as("w"))
      .filter(col("_k") =!= "")
      .select(col("src"), col("_k").cast("long").as("dst"), col("w"))
}
