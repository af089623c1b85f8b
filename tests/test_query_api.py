"""Query-API compiler vs DuckDB: the compiled plan must match handwritten
SQL, and invalid requests must be rejected."""

from __future__ import annotations

import pytest

from scrapy_cluster_test_spark.operators.query_api import (
    QueryError,
    QuerySpec,
    compile_query,
)
from scrapy_cluster_test_spark.sources import tables

from .conftest import SF_TINY
from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_TINY)
    yield con
    con.close()


def test_compiled_page_matches_sql(spark, duck):
    spec = QuerySpec(
        filters=[("c_acctbal", "gte", 0), ("c_mktsegment", "isin", ["BUILDING", "AUTOMOBILE"])],
        search={"c_name": "customer#0000001"},
        ordering=["-c_acctbal", "c_name"],
        page=2,
        per_page=10,
        exclude=["c_nationkey"],
        distinct_key="c_custkey",
    )
    page, count = compile_query(
        tables.load(spark, SF_TINY, "customer"), spec, tiebreak="c_custkey"
    )
    res = compare(
        page,
        duck,
        """
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        WHERE c_acctbal IS NOT NULL AND c_acctbal >= 0
          AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
          AND regexp_matches(lower(c_name), 'customer#0000001')
        ORDER BY c_acctbal DESC, c_name ASC, c_custkey ASC
        LIMIT 10 OFFSET 10
        """,
    )
    assert res["ok"], res
    res2 = compare(
        count,
        duck,
        """
        SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS total_count
        FROM customer
        WHERE c_acctbal IS NOT NULL AND c_acctbal >= 0
          AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
          AND regexp_matches(lower(c_name), 'customer#0000001')
        """,
    )
    assert res2["ok"], res2


def test_unknown_field_rejected(spark):
    with pytest.raises(QueryError):
        compile_query(
            tables.load(spark, SF_TINY, "customer"),
            QuerySpec(filters=[("no_such_col", "eq", 1)]),
        )


def test_where_injection_rejected(spark):
    with pytest.raises(QueryError):
        compile_query(
            tables.load(spark, SF_TINY, "customer"),
            QuerySpec(search={"c_name": "$where: x"}),
        )


def test_filter_pushdown_reaches_scan(spark):
    """The compiled filter must reach the parquet scan (PushedFilters) and
    the projection must prune columns (ReadSchema) — SURVEY §4."""
    spec = QuerySpec(filters=[("c_acctbal", "gte", 5000)], ordering=["c_custkey"])
    page, _ = compile_query(tables.load(spark, SF_TINY, "customer"), spec)
    plan = page.select("c_custkey", "c_acctbal")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "c_acctbal" in plan.split("PushedFilters")[1][:200]
