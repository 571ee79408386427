package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass web-corpus pipelines
  * (C4/CCNet-style crawls) run before exact dedup, so that the dozens of
  * raw spellings of one page (case-shifted hosts, default ports,
  * tracking parameters, shuffled query order, fragments, trailing
  * slashes) collapse to a single key.
  *
  * Everything is built from codegen'd string/array functions in the
  * regex subset Java and RE2 share (the [[TextAnalysis]] PII-scrub
  * precedent), so the DuckDB oracle can replicate the transform
  * verbatim: no UDFs, no opaque parser, one zero-shuffle projection.
  * Dedup on the canonical key is then a plain keyed aggregate.
  *
  * Rules (the widely-published safe set; deliberately excludes
  * percent-decoding and path dot-segment resolution, which change
  * semantics on some servers):
  *  - scheme and host lowercased; leading `www.` stripped
  *  - default ports dropped (`:80` for http, `:443` for https)
  *  - fragment dropped
  *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`, `ref`)
  *  - surviving query parameters sorted bytewise and rejoined
  *  - empty path → `/`; non-root trailing slash stripped
  */
object Web {

  private val auth = "([^/?#]*)" // authority: up to first /, ? or #
  private val path = "([^?#]*)"  // path: up to ? or #
  private val urlRe = s"^([A-Za-z][A-Za-z0-9+.-]*)://$auth$path(\\?([^#]*))?.*"

  /** Canonical form of `url` (any non-URL string canonicalizes to the
    * empty-scheme form and simply never collides with real pages). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, urlRe, 1))
    val rawHost = lower(regexp_extract(url, urlRe, 2))
    val noWww = regexp_replace(rawHost, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val rawPath = regexp_extract(url, urlRe, 3)
    val cPath = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    val rawQuery = regexp_extract(url, urlRe, 5)
    val kept = array_join(
      array_sort(filter(split(rawQuery, "&"), p =>
        p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))), "&")
    concat(scheme, lit("://"), host, cPath,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }
}
