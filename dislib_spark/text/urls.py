"""URL canonicalization + host dedup keys — the crawl-curation
staple next to exact text dedup (t03): the same page is fetched under
scheme/case/port/param-order/tracking-param variants, and training
pipelines dedup on the CANONICAL form (public practice: CommonCrawl /
CCNet-style URL normalization).

Extension surface (no reference counterpart — dislib has no string
layer).

Everything is JVM-side string expressions (regexp_extract / split /
array_sort — no UDFs), so canonical forms are byte-exact replayable
in any ANSI engine. The grammar covered is absolute http(s) URLs
(``scheme://host[:port][/path][?query][#fragment]``); inputs outside
it pass through the same extractors and normalize best-effort.

Normalization steps (each one a documented, deterministic rewrite):
  1. trim; strip the ``#fragment``
  2. scheme → lowercase
  3. host → lowercase, strip one leading ``www.``, strip a trailing
     dot
  4. drop the default port (http:80 / https:443) and empty ``:``
  5. path: collapse ``//`` runs, strip the trailing slash
  6. query: split on ``&``, drop empties and tracking params
     (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``, ``igshid``,
     ``ref``), sort the survivors bytewise, re-join with ``&``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query params dropped during canonicalization (analytics trackers
#: that never change page content) — keep in sync with the regex in
#: both engines' replays.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|ref)(=|$)"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?]*([^?]*)"


def url_host(url: Column) -> Column:
    """Normalized host of an absolute URL: lowercase, no ``www.``
    prefix, no trailing dot, no port."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    return F.regexp_replace(host, r"\.$", "")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc for
    the step list). Pure JVM expression tree — one projection, no
    shuffle, byte-replayable."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = url_host(url)
    port = F.regexp_extract(auth, r":([0-9]*)$", 1)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
