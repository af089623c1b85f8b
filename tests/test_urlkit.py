"""URL kernel: Spark column builders vs pure-Python mirrors must agree,
and the pure-Python XXH64 must match Spark's xxhash64 exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_cluster_test_spark.functions import urlkit
from scrapy_cluster_test_spark.functions.xxh64 import (
    xxh64_long,
    xxh64_long2,
    xxh64_str,
)

URLS = [
    "https://Example.COM/a/b?z=1&a=2#frag",
    "http://amazon.com/sp?seller=A3X&asin=B07RCNHTLS",
    "https://api.proxycrawl.com/?token=tk&url=https%3A%2F%2Famazon.com%2Fdp%2FB01",
    "https://shop.example.org/path/",
    "https://shop.example.org/path",
    "http://HOST.net/x?b=2&a=1&a=0",
    "https://example.com",
    "https://example.com/?",
]


def test_canonicalize_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string").select(
        "url",
        urlkit.canonicalize(F.col("url")).alias("canon"),
    )
    for r in df.collect():
        assert r.canon == urlkit.py_canonicalize(r.url), r.url


def test_fingerprint_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    canon = urlkit.canonicalize(F.col("url"))
    df = df.select(
        "url",
        canon.alias("canon"),
        urlkit.url_fingerprint(canon).alias("fp"),
        urlkit.domain_of(canon).alias("domain"),
        urlkit.domain_hash(urlkit.domain_of(canon)).alias("dh"),
    )
    for r in df.collect():
        assert r.fp == urlkit.py_url_fingerprint(r.canon)
        assert r.domain == urlkit.py_domain_of(r.canon)
        assert r.dh == urlkit.py_domain_hash(r.domain)


def test_xxh64_matches_spark(spark):
    rows = [("", 0), ("a", 1), ("caption 42: xyzzy", -5), ("ünïcødé", 2**40 + 3)]
    df = spark.createDataFrame(rows, "s string, v long").select(
        "s",
        "v",
        F.xxhash64("s").alias("hs"),
        F.xxhash64("v").alias("hv"),
        F.xxhash64("v", "s").alias("hvs"),
    )
    from scrapy_cluster_test_spark.functions.xxh64 import _signed, xxh64

    for r in df.collect():
        assert xxh64_str(r.s) == r.hs
        assert xxh64_long(r.v) == r.hv
        # chained multi-column hash: running hash seeds the next column
        h1 = xxh64((r.v & (2**64 - 1)).to_bytes(8, "little"), 42)
        assert _signed(xxh64(r.s.encode(), h1)) == r.hvs


def test_canonical_idempotent(spark):
    canon1 = [urlkit.py_canonicalize(u) for u in URLS]
    canon2 = [urlkit.py_canonicalize(c) for c in canon1]
    assert canon1 == canon2


def test_proxy_unwrap():
    wrapped = "https://api.proxycrawl.com/?token=tk&url=https%3A%2F%2Famazon.com%2Fdp%2FB01"
    assert urlkit.py_canonicalize(wrapped) == "https://amazon.com/dp/B01"


def test_child_urls_already_canonical(spark):
    """discover_children builds child URLs canonical BY CONSTRUCTION and
    skips canonicalize() (six parse_url calls/row saved on the 10x
    fan-out); this pins the identity the shortcut relies on."""
    df = spark.range(200).select(
        (F.col("id") % 7).cast("int").alias("d"),
        F.col("id").alias("j"),
        F.when(F.col("id") % 2 == 0, "seller").otherwise("asin").alias("k"),
    )
    url = F.concat(
        F.lit("https://d"),
        F.lpad(F.col("d").cast("string"), 4, "0"),
        F.lit(".example.com/"),
        F.col("k"),
        F.lit("/"),
        F.lpad(F.col("j").cast("string"), 10, "0"),
    )
    bad = (
        df.select(url.alias("u"), urlkit.canonicalize(url).alias("c"))
        .filter("u != c OR c IS NULL")
        .count()
    )
    assert bad == 0
