"""The analytics read path: an HTTP-style query compiler.

Reference: the FastAPI `/seller-database` handler compiles ~60 query
params into a Mongo aggregation pipeline — allowlist-validated sort spec
with `-field` descending syntax (api/app/main.py:231-249), range triples
(252-369), case-insensitive regex search (371-457), `$or` id alternatives
(391-401), array-size bounds (344-360), count-distinct subquery (507-513),
skip/limit pagination with a 30-field unset (515-521).

Here the same request shape compiles to a DataFrame plan; Catalyst pushes
the filters into the parquet scan (PushedFilters), prunes columns
(ReadSchema), and plans the count as a partial-agg — none of which the
reference's Mongo pipeline could guarantee.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QueryError(ValueError):
    """Invalid request (unknown field, bad op) — mirrors the API's 4xx."""


@dataclass
class QuerySpec:
    # [(field, op, value)] with op ∈ {eq, ne, gte, lte, gt, lt, isin, size_gte, size_lte}
    filters: list[tuple[str, str, object]] = field(default_factory=list)
    # {field: regex} — case-insensitive, like $regex $options:i
    search: dict[str, str] = field(default_factory=dict)
    # ["-fieldA", "fieldB"] — '-' prefix = descending (api/app/main.py:231-249)
    ordering: list[str] = field(default_factory=list)
    page: int = 1
    per_page: int = 20
    exclude: list[str] = field(default_factory=list)  # $unset analog
    distinct_key: str | None = None  # count-distinct subquery key


_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c.isNotNull() & (c != v),
    "gte": lambda c, v: c.isNotNull() & (c >= v),
    "lte": lambda c, v: c.isNotNull() & (c <= v),
    "gt": lambda c, v: c.isNotNull() & (c > v),
    "lt": lambda c, v: c.isNotNull() & (c < v),
    "isin": lambda c, v: c.isin(*v),
    "size_gte": lambda c, v: F.size(c) >= v,
    "size_lte": lambda c, v: F.size(c) <= v,
}


def _validate(df: DataFrame, fields: list[str]) -> None:
    cols = set(df.columns)
    for f_ in fields:
        if f_ not in cols:
            raise QueryError(f"unknown field {f_!r}")


def apply_filters(df: DataFrame, spec: QuerySpec) -> DataFrame:
    _validate(df, [f_ for f_, _, _ in spec.filters] + list(spec.search))
    for f_, op, v in spec.filters:
        if op not in _OPS:
            raise QueryError(f"unknown op {op!r}")
        df = df.filter(_OPS[op](F.col(f_), v))
    for f_, pat in spec.search.items():
        if "$where" in pat:  # injection guard parity (api/app/main.py:387-389)
            raise QueryError("$where not allowed")
        df = df.filter(F.col(f_).rlike(f"(?i){pat}"))
    return df


def apply_ordering(df: DataFrame, spec: QuerySpec, tiebreak: str | None = None) -> DataFrame:
    cols = []
    _validate(df, [o.lstrip("-") for o in spec.ordering])
    for o in spec.ordering:
        cols.append(F.col(o[1:]).desc() if o.startswith("-") else F.col(o).asc())
    if tiebreak:
        cols.append(F.col(tiebreak).asc())
    return df.orderBy(*cols) if cols else df


def compile_query(
    df: DataFrame, spec: QuerySpec, tiebreak: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """→ (page_df, count_df). ``count_df`` is the one-row count(distinct)
    envelope subquery; ``page_df`` the paginated result with exclusions
    applied. Both share the filter chain (Catalyst dedups the scan)."""
    filtered = apply_filters(df, spec)
    if spec.distinct_key:
        count_df = filtered.agg(
            F.countDistinct(spec.distinct_key).alias("total_count")
        )
    else:
        count_df = filtered.agg(F.count("*").alias("total_count"))
    page = (
        apply_ordering(filtered, spec, tiebreak)
        .offset((spec.page - 1) * spec.per_page)
        .limit(spec.per_page)
        .drop(*[c for c in spec.exclude if c in filtered.columns])
    )
    return page, count_df


def with_opaque_id(
    df: DataFrame, id_field: str, secret: bytes, now_ts: int
) -> DataFrame:
    """Replace ``id_field`` with the url-quoted opaque token the API
    hands out on list rows — ``urllib.parse.quote(crypt.encryt(id))``
    in the reference (api/app/main.py:613-614). One native projection
    (idcrypt is codegen-side); apply AFTER pagination so only the page's
    rows pay the AES, like the reference's per-row loop over the
    already-limited cursor."""
    from ..functions import idcrypt

    _validate(df, [id_field])
    return df.withColumn(
        id_field,
        F.url_encode(idcrypt.encrypt_id(F.col(id_field), secret, F.lit(now_ts))),
    )


def resolve_opaque_id(
    spark, token: str, secret: bytes, now_ts: int
) -> str:
    """Detail-endpoint inverse (``/seller``, api/app/main.py:626-631):
    url-unquote + decrypt one request token back to the storage id.
    Runs as a one-row JVM plan (no Python crypto); the single collect is
    driver-bounded by construction. Invalid or expired tokens raise
    QueryError — the reference's 400 paths."""
    from ..functions import idcrypt

    row = (
        spark.range(1)
        .select(
            idcrypt.decrypt_id(
                F.url_decode(F.lit(token)), secret, F.lit(now_ts)
            ).alias("d")
        )
        .head()
    )
    if row is None or not row["d"]["valid"]:
        raise QueryError("invalid or expired id token")
    return row["d"]["id"]
