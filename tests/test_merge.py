"""MERGE emulation semantics: upsert, insert-if-absent, update-matched."""

from __future__ import annotations


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long")


def test_upsert(spark):
    from scrapy_cluster_test_spark.operators.merge import upsert

    target = _df(spark, [(1, "a", 1), (2, "b", 1)])
    updates = _df(spark, [(2, "B", 2), (2, "B_old", 1), (3, "c", 2)])
    out = {r.k: r.v for r in upsert(target, updates, ["k"], ["ts"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c"}  # last-wins by ts for k=2


def test_insert_if_absent(spark):
    from scrapy_cluster_test_spark.operators.merge import insert_if_absent

    target = _df(spark, [(1, "a", 1)])
    inserts = _df(spark, [(1, "SHOULD_NOT_WIN", 9), (2, "b", 1)])
    out = {r.k: r.v for r in insert_if_absent(target, inserts, ["k"], ["ts"]).collect()}
    assert out == {1: "a", 2: "b"}  # $setOnInsert: existing row wins


def test_update_matched(spark):
    from scrapy_cluster_test_spark.operators.merge import update_matched

    target = _df(spark, [(1, "a", 1), (2, "b", 1)])
    updates = _df(spark, [(2, "B", 2), (3, "ignored", 2)])
    out = {r.k: (r.v, r.ts) for r in update_matched(
        target, updates, ["k"], ["v"]
    ).collect()}
    assert out == {1: ("a", 1), 2: ("B", 1)}  # only v updated, no insert
