"""Every catalog query with an oracle must match DuckDB at sf0.001.

This mirrors the driver's sf0.01 gate; sf0.001 keeps the suite fast. A
separate slow marker re-runs at sf0.01 (enable with -m sf001).
"""

from __future__ import annotations

import pytest

from scrapy_cluster_test_spark.plans.catalog import catalog

from .conftest import SF_TINY
from .oracle_harness import compare, duck_connection

ENTRIES = [e for e in catalog().values() if e.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_TINY)
    yield con
    con.close()


@pytest.mark.parametrize("entry", ENTRIES, ids=[e.name for e in ENTRIES])
def test_oracle_match(spark, duck, entry):
    df = entry.builder(spark, SF_TINY)
    res = compare(df, duck, entry.oracle)
    assert res["ok"], f"{entry.name}: {res}"


def test_all_queries_return_rows(spark):
    for e in catalog().values():
        n = e.builder(spark, SF_TINY).count()
        assert n >= 0, e.name
