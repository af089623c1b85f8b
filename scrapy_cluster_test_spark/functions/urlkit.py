"""URL kernel: canonicalization, fingerprinting, domain hashing.

Reference parallels:
* proxy-URL unwrap `parse_qs(query)["url"][0]` + unquote —
  scrapy_project/project/utils.py:54-57
* URL building/quoting — utils.py:60-67
* no real fingerprint in the reference (dupefilter disabled, SURVEY D1);
  the north rule adds xxhash64(canonical_url).

Two implementations with identical semantics:
* column builders (native Spark functions — codegen'd, no Python in the
  hot path), used by the engine;
* plain-Python mirrors used by the oracle simulator; parity is asserted
  in tests/test_urlkit.py.

Canonical form (applied in this order):
1. if the URL is proxy-wrapped (has a ``url=`` query param), unwrap one
   level (percent-decoded);
2. scheme and host lowercased; fragment dropped;
3. query parameters sorted lexicographically (byte order of ``k=v``
   atoms); empty query drops the ``?``;
4. path kept verbatim ('' stays '' — no trailing-slash normalization,
   matching the reference's byte-faithful URL handling).
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import Column
from pyspark.sql import functions as F

from .xxh64 import xxh64_str

# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------


def unwrap_proxy(url: Column) -> Column:
    """One-level unwrap of proxy-wrapped URLs (utils.py:54-57)."""
    inner = F.parse_url(url, F.lit("QUERY"), F.lit("url"))
    return F.when(inner.isNotNull(), F.url_decode(inner)).otherwise(url)


def _rebuild_canonical(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.parse_url(url, F.lit("QUERY"))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(
            query.isNotNull() & (query != ""), F.concat(F.lit("?"), sorted_query)
        ).otherwise(F.lit("")),
    )


def canonicalize(url: Column) -> Column:
    """Canonical URL column (see module docstring for the rule list)."""
    return _rebuild_canonical(unwrap_proxy(url))


def url_fingerprint(canonical_url: Column) -> Column:
    """xxhash64 fingerprint of the canonical URL (north rule F4)."""
    return F.xxhash64(canonical_url)


def domain_of(canonical_url: Column) -> Column:
    return F.lower(F.parse_url(canonical_url, F.lit("HOST")))


def domain_hash(domain: Column) -> Column:
    return F.xxhash64(domain)


# ---------------------------------------------------------------------------
# Python mirrors (oracle simulator only — never in the Spark hot path)
# ---------------------------------------------------------------------------


def py_unwrap_proxy(url: str) -> str:
    parts = urllib.parse.urlsplit(url)
    qs = urllib.parse.parse_qs(parts.query)
    if "url" in qs and qs["url"]:
        return qs["url"][0]
    return url


def py_canonicalize(url: str) -> str:
    url = py_unwrap_proxy(url)
    parts = urllib.parse.urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    path = parts.path
    query = parts.query
    out = f"{scheme}://{host}{path}"
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


def py_url_fingerprint(canonical_url: str) -> int:
    return xxh64_str(canonical_url)


def py_domain_of(canonical_url: str) -> str:
    return (urllib.parse.urlsplit(canonical_url).hostname or "").lower()


def py_domain_hash(domain: str) -> int:
    return xxh64_str(domain)
