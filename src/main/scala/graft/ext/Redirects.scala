package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution over demuxed crawl metadata — ONE
  * definition shared by the q212 batch query and
  * [[graft.stream.StreamingRedirects]], so the unrolled-join semantics
  * can never fork between the two (the [[Crawl]]/StreamingCrawl
  * discipline).
  *
  * Every crawled URL is followed to its landing page with a HARD 3-hop
  * cap: three unrolled left joins against the redirect edge subset — a
  * cycle or a hostile chain costs a fixed number of shuffles, never an
  * unbounded loop. Targets that were never crawled resolve to a dangling
  * final URL with a NULL final status.
  *
  * Scale shape: the per-URL frame joins the redirect EDGE subset
  * (usually far sparser than the crawl) three times on the URL key;
  * everything is equi-join + one checkpoint of the demuxed metadata read
  * four ways (start set + three edge probes + the final-status lookup).
  */
object Redirects {

  /** Resolve chains over `(uri, http_status, location)` metadata rows
    * (the [[Warc.extractHttpMeta]] schema). Returns (orig, final_uri,
    * final_status, hops). */
  def resolve(meta0: DataFrame): DataFrame = {
    val meta = meta0.localCheckpoint(true) // start set + edges + status lookup
    val edges = meta
      .filter(col("http_status").between(300, 399) && col("location").isNotNull)
      .select(col("uri").as("src"), col("location").as("dst"))
    var cur = meta.select(col("uri").as("orig"), col("uri").as("cur"),
      lit(0L).as("hops"))
    for (_ <- 1 to 3) {
      cur = cur.join(edges, cur("cur") === edges("src"), "left")
        .select(col("orig"),
          coalesce(col("dst"), col("cur")).as("cur"),
          (col("hops") + when(col("dst").isNotNull, 1L).otherwise(0L))
            .as("hops"))
    }
    cur
      .join(meta.select(col("uri").as("cur"),
        col("http_status").as("final_status")), Seq("cur"), "left")
      .select(col("orig"), col("cur").as("final_uri"), col("final_status"),
        col("hops"))
  }
}
