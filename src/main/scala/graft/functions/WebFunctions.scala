package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation (beyond-reference
  * surface, the standard pre-dedup normalization for crawled data):
  * two URLs that differ only in case of scheme/host, fragment,
  * default port, tracking parameters, or query-parameter order are
  * the same fetch target and must collapse to one key before any
  * URL-level dedup or per-domain capping.
  *
  * Rules (documented, deliberately minimal):
  *  1. fragment stripped (`#…`)
  *  2. scheme and host lowercased (path and query are case-sensitive
  *     per RFC 3986 and left alone)
  *  3. default port stripped (`:80` for http, `:443` for https)
  *  4. tracking params dropped (`utm_*`, `fbclid`, `gclid`)
  *  5. remaining query params sorted byte-wise (param order never
  *     changes the resource)
  *  6. empty path becomes `/`
  *
  * Everything is regexp/HOF-composed from native codegen'd functions
  * (no UDF), with patterns simple enough to evaluate identically
  * under Java regex and RE2 — the oracle replays them term for term.
  * A URL that does not match `scheme://authority…` is returned
  * unchanged (canonicalization must never invent structure).
  *
  * Scale shape: pure per-row projection — no exchange at any size.
  */
object WebFunctions {

  private val urlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?$"

  /** Registrable-domain approximation: the last two dot-labels of the
    * canonical host (no public-suffix list in a zero-dep engine; the
    * dial a real deployment swaps for a PSL lookup table join). */
  def urlDomain(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val host = lower(regexp_replace(regexp_extract(noFrag, urlRe, 2),
      ":[0-9]+$", ""))
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  def urlCanonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, urlRe, 1))
    val rawHost = lower(regexp_extract(noFrag, urlRe, 2))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val path = when(regexp_extract(noFrag, urlRe, 3) === "", lit("/"))
      .otherwise(regexp_extract(noFrag, urlRe, 3))
    val rawQ = regexp_replace(regexp_extract(noFrag, urlRe, 4), "^\\?", "")
    val params = array_sort(filter(split(rawQ, "&"),
      p => p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid)=")))
    val q = array_join(params, "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
    when(regexp_extract(noFrag, urlRe, 1) === "", url).otherwise(canon)
  }
}
