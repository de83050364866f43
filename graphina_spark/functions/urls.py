"""URL canonicalization — frozen v1 normalization, all JVM-side.

Crawl dedup's first line of defense: `HTTP://WwW.Ex.COM:80/p?utm_source=x`
and `http://www.ex.com/p` are the same resource, and at 10^12 pages the
duplicate-url rate from case/port/tracking-param noise is a double-digit
percentage.  The rules are FROZEN (URL_CANON_VERSION) like
functions/extract.py's text extraction, so canonical urls are byte-stable
across runs and releases:

  1. scheme and host lowercased (path/query untouched — case-significant)
  2. fragment stripped
  3. default port stripped (:80 for http, :443 for https)
  4. tracking params dropped (utm_*, gclid, fbclid); other params keep
     their original order; an emptied query loses its '?'
  5. trailing '/' stripped from non-root paths

Everything is built-in column expressions (regexp + higher-order array
functions) — whole-stage codegen, zero Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URL_CANON_VERSION = 1

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = "^(utm_[^=]*|gclid|fbclid)(=.*)?$"


def canonical_url(url: Column | str) -> Column:
    """Frozen v1 canonical form of an absolute http(s) url column.

    Urls without a scheme pass through unchanged (nothing to normalize
    against)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")  # 2. fragment
    hostport = F.regexp_extract(rest, "^([^/?]+)", 1)
    tail = F.substring(rest, F.length(hostport) + F.lit(1), F.lit(2_000_000_000))
    host = F.lower(hostport)  # 1. host case
    host = F.when(  # 3. default ports
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, F.lit(1), F.length(host) - F.lit(3)),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.substring(host, F.lit(1), F.length(host) - F.lit(4)),
    ).otherwise(host)
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.when(  # 5. trailing slash on non-root paths
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - F.lit(1)),
    ).otherwise(path)
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(  # 4. tracking params, order preserved
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_RE),
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, qpart)
    return F.when(scheme == "", u).otherwise(canon)
