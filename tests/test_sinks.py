"""Export sinks: CSV with hyperlink cells + dedup, chunked gzip JSONL
(1000 records/file contract), callback summary."""

from __future__ import annotations

import glob
import gzip
import json
import os

from scrapy_cluster_test_spark.operators import sinks
from scrapy_cluster_test_spark.sources import tables

from .conftest import SF_TINY


def test_export_csv_dedup_hyperlink(spark, tmp_path):
    out = str(tmp_path / "csv_out")
    li = tables.load(spark, SF_TINY, "lineitem").selectExpr(
        "l_orderkey", "l_partkey", "cast(l_orderkey as string) AS url"
    )
    sinks.export_csv(li, out, dedup_keys=["l_orderkey"], hyperlink_cols=["url"])
    back = spark.read.option("header", True).csv(out)
    n_orders = li.select("l_orderkey").distinct().count()
    assert back.count() == n_orders
    row = back.limit(1).collect()[0]
    assert row["url"].startswith('=HYPERLINK("')


def test_export_jsonl_gz_chunking(spark, tmp_path):
    out = str(tmp_path / "jsonl_out")
    ev = tables.load(spark, SF_TINY, "events").coalesce(1)
    n = ev.count()
    sinks.export_jsonl_gz(ev, out, records_per_file=100)
    files = sorted(glob.glob(os.path.join(out, "*.json.gz")))
    assert len(files) >= n // 100  # 1000 rows / 100 per file
    total = 0
    for fp in files:
        with gzip.open(fp, "rt") as f:
            lines = f.readlines()
        assert len(lines) <= 100
        total += len(lines)
        json.loads(lines[0])
    assert total == n


def test_callback_summary(tmp_path):
    p = str(tmp_path / "cb" / "SUMMARY.json")
    sinks.write_callback_summary(p, {"status": "finished", "epochs": 3})
    with open(p) as f:
        assert json.load(f)["status"] == "finished"


def test_post_callback_real_http():
    """K8: the callback is a real HTTP POST of the reference's envelope
    (pipelines.py:219-252), exercised against a local HTTP server."""
    import http.server
    import json as _json
    import threading

    from scrapy_cluster_test_spark.operators import sinks

    got = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            got["body"] = _json.loads(self.rfile.read(n))
            got["ctype"] = self.headers["Content-Type"]
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status = sinks.post_callback(
            f"http://127.0.0.1:{srv.server_port}/callback",
            job_id="job-42",
            scraped_items_len=17,
            extra={"s3_links": None},
        )
    finally:
        srv.shutdown()
    assert status == 200
    assert got["ctype"] == "application/json"
    assert got["body"] == {
        "project": "scrapy_cluster_test_spark",
        "spider": "crawl",
        "job_id": "job-42",
        "data": {"scraped_items_len": 17, "s3_links": None},
    }
