package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl curation: the same page arrives under many
  * spellings (scheme case, `www.` prefix, trailing slash, tracking params,
  * fragments, param order), and exact dedup only works after the spellings
  * collapse to one canonical key. Regex-only (no `parse_url`, which DuckDB
  * lacks) so the oracle replays every rule byte-identically.
  *
  * All pure Column expressions — map-only at any scale; the canonical key
  * then feeds the standard hash-groupBy exact-dedup shuffle.
  */
object Urls {

  /** Hostname, lowercased, leading `www.` stripped. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[a-zA-Z]+://([^/?#]+)", 1)),
      "^www\\.", "")

  /** Path with any trailing `/` removed (`/a/b/` ≡ `/a/b`; bare `/` ≡ ``). */
  def path(url: Column): Column =
    regexp_replace(regexp_extract(url, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1),
      "/+$", "")

  /** Query string with tracking params (`utm_*`, `ref`, `fbclid`) and empty
    * fragments dropped, remaining params SORTED so param order never splits
    * a canonical key. The HOF runs per URL over a handful of params —
    * interpreted cost is negligible (see NOTES on hot HOFs). */
  def cleanQuery(url: Column): Column = {
    val raw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(raw, "&"), p =>
      length(p) > 0 &&
        !p.startsWith("utm_") && !p.startsWith("ref=") && !p.startsWith("fbclid="))
    array_join(sort_array(kept), "&")
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the urlkey field
    * of a CDX index line): host components REVERSED and comma-joined,
    * `)`, then the canonical path — so one domain's pages sort together
    * and a range scan over the sorted index covers exactly one
    * host/prefix subtree (`org,example)/doc/7`). Built on the same
    * [[host]]/[[path]] normalizations as [[canonical]]. */
  def surtKey(url: Column): Column =
    concat(array_join(reverse(split(host(url), "\\.")), ","), lit(")"),
      path(url))

  /** URL TEMPLATE for crawler-trap mining: the path+query (fragment
    * dropped) with hex runs of ≥ 8 chars (the session-id/token shape)
    * collapsed to `H` and remaining digit runs to `D`, so every URL a
    * single generator mints (calendar pages, session tokens, pagination
    * counters) folds to ONE template — the per-(host, template) rollup
    * then sees a trap's fanout as data. Hex first: a long pure-digit run
    * is a valid hex run and templates as `H` — deterministic, and the
    * oracle replays the same two-pass substitution byte-identically.
    * Map-only at any scale, like every operator here. */
  def template(url: Column): Column = {
    val pq = regexp_extract(url, "^[a-zA-Z]+://[^/?#]+([^#]*)", 1)
    regexp_replace(regexp_replace(pq, "[0-9a-f]{8,}", "H"), "[0-9]+", "D")
  }

  /** Canonical form: `host` + `path` (+ `?` + sorted clean query). Scheme and
    * fragment are dropped entirely — http/https/HTTPS variants of one page
    * collapse. */
  def canonical(url: Column): Column = {
    val q = cleanQuery(url)
    concat(host(url), path(url),
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")))
  }
}
