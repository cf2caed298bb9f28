package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-provenance operators for corpus cleaning — URL extraction,
  * host / registrable-domain derivation, domain blocklist filtering,
  * per-domain accounting. A crawl-derived corpus is curated by
  * provenance at least as much as by content (C4 dropped whole domains;
  * every production pipeline carries a blocklist), so these sit beside
  * the text-quality operators as first-class cleaning steps.
  *
  * Everything is a pure RE2-safe expression (engine-portable,
  * codegen'd, no UDF); the only shuffle in the family is the final
  * per-domain aggregate. Deliberately regex-based rather than
  * `parse_url` so the DuckDB oracle runs the IDENTICAL spelling.
  */
object Web {

  private val UrlPattern = """https?://[^\s]+"""
  private val HostPattern = """^https?://([^/:?#]+)"""

  /** All http(s) URLs in a text column, in order, as an array. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPattern), lit(0))

  /** Host of an http(s) URL (`scheme://HOST[:port]/…`); empty string
    * when the value does not parse.
    */
  def urlHost(url: Column): Column =
    regexp_extract(url, HostPattern, 1)

  /** Naive registrable domain: the last two dot-labels of the host.
    * The honest production version substitutes the public-suffix list
    * (co.uk and friends) — same plan shape, a broadcast lookup against
    * a bigger table; documented compromise, not a hidden one.
    */
  def registrableDomain(host: Column): Column = {
    val parts = split(host, "\\.")
    when(size(parts) <= 2, host)
      .otherwise(concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
  }

  /** Drop rows whose `domainCol` appears in `blocked` (first column) —
    * one broadcast anti-join; blocklists are small by nature.
    */
  def filterBlockedDomains(
      df: DataFrame, domainCol: String, blocked: DataFrame): DataFrame =
    df.join(
      broadcast(blocked.select(col(blocked.columns.head).as(domainCol)).distinct()),
      Seq(domainCol), "left_anti")

  /** Per-domain corpus accounting (docs, chars) — the what-am-I-made-of
    * report a corpus recipe starts from. One partially-aggregated
    * shuffle on the domain key.
    */
  def domainStats(df: DataFrame, domainCol: String, sizeCol: String): DataFrame =
    df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("sum_chars"))
}
