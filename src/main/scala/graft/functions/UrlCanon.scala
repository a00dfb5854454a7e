package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the C4/RefinedWeb web-corpus normalization:
  * strip the fragment, strip utm-only query strings, lowercase the host
  * (and ONLY the host), strip the trailing slash (also when a query
  * string follows it). One place, three consumers: the batch dedup query
  * (q_dedup_url), the streaming incremental variant
  * (StreamingDedupSpec), and anything downstream that needs a canonical
  * join key. RE2-safe patterns (no lookarounds) so the DuckDB oracle
  * reproduces each step verbatim.
  */
object UrlCanon {

  /** Canonical form of `raw` (scheme assumed `https://`). */
  def canonicalize(raw: Column): Column = {
    val noFrag = regexp_replace(raw, "#.*$", "")
    val noUtm = regexp_replace(noFrag, "\\?utm_[^#]*$", "")
    // trailing-slash strip must also fire when a query string follows the
    // slash (`/p/3/?id=5` → `/p/3?id=5`); RE2 has no lookahead, so
    // capture-and-reinsert the query instead (Spark `$1` ≡ DuckDB `\1`)
    concat(lit("https://"),
      lower(regexp_extract(noUtm, "^https://([^/]+)", 1)),
      regexp_replace(regexp_extract(noUtm, "^https://[^/]+(.*)$", 1),
        "/(\\?.*)?$", "$1"))
  }
}
