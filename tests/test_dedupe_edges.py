"""Dedup edge cases: documents shorter than the shingle width must yield
zero shingles (matching DuckDB generate_series semantics), not crash the
job with INVALID_ARRAY_INDEX (ADVICE r1)."""

from __future__ import annotations

from scrapy_cluster_test_spark.operators import dedupe


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "one"),                      # 1 word  < n=3
            ("d2", "just two"),                 # 2 words < n=3
            ("d3", "exactly three words"),      # == n → 1 shingle
            ("d4", "this doc has plenty of words to shingle fine"),
            ("d5", ""),                         # empty text
        ],
        "doc_id string, text string",
    )


def test_shingles_short_docs_no_crash(spark):
    sh = dedupe.shingles(_docs(spark), "doc_id", n=3).collect()
    by_doc = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, []).append(r.shingle)
    assert "d1" not in by_doc and "d2" not in by_doc and "d5" not in by_doc
    assert by_doc["d3"] == ["exactly three words"]
    assert len(by_doc["d4"]) == 7  # 9 words → 7 trigrams


def test_minhash_and_jaccard_short_docs_no_crash(spark):
    docs = _docs(spark)
    sigs = dedupe.minhash_signatures(docs, "doc_id").collect()
    assert {r.doc_id for r in sigs} == {"d3", "d4"}  # short docs drop out
    pairs = dedupe.lsh_candidate_pairs(docs, "doc_id")
    jac = dedupe.ngram_jaccard_pairs(docs, "doc_id", pairs).collect()
    assert all(0.0 <= r.jaccard <= 1.0 for r in jac)
