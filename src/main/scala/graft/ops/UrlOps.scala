package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization (the CommonCrawl/C4 crawl-dedup rewrite),
  * exposed as a reusable Column transform so the qp_url_dedup gate and
  * any ingest pipeline share one definition. Five deterministic
  * rewrites, all plain codegen'd regex — no UDF:
  *
  *  1. drop the fragment;
  *  2. lowercase scheme://host[:port];
  *  3. strip the scheme's default port (:443 for https, :80 for http);
  *  4. scrub tracking params (utm_*, fbclid) and repair the query
  *     framing they leave behind;
  *  5. normalize trailing slashes (before the query and at the end).
  *
  * Idempotent by construction (PropertySpec pins canon∘canon = canon on
  * crafted adversarial inputs); DuckDB mirror lives in
  * PipelineQueries.oracle("qp_url_dedup").
  */
object UrlOps {
  def canonicalizeUrl(raw: Column): Column = {
    val noFrag = regexp_replace(raw, "#.*", "")
    val head = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+", 0)
    val tail = noFrag.substr(length(head) + 1, length(noFrag))
    val canonHead = regexp_replace(
      regexp_replace(lower(head), "^https://(.*):443$", "https://$1"),
      "^http://(.*):80$", "http://$1")
    val canonTail = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(
        regexp_replace(tail, "(utm_[a-z]+|fbclid)=[^&]*", ""),
        "&&+", "&"), "\\?&", "?"), "[?&]+$", ""), "/\\?", "?"),
      "/+$", "")
    concat(canonHead, canonTail)
  }
}
