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


def test_lsh_bucket_cap_bounds_degenerate_bucket(spark):
    """VERDICT r2 item #7: a planted degenerate bucket (many documents
    with identical text -> one bucket per band holding all of them) is
    dropped by max_bucket_size BEFORE the self-join, bounding the pair
    output; genuine near-dup pairs in small buckets survive."""
    clone = "the same boilerplate text repeated across many documents"
    rows = [(i, clone) for i in range(100)]
    # two genuinely-similar docs sharing most shingles (small bucket)
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta eta theta"),
        (1001, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedupe.lsh_candidate_pairs(docs, "doc_id")
    n_uncapped = uncapped.count()
    assert n_uncapped >= 100 * 99 // 2  # quadratic blowup present

    capped = dedupe.lsh_candidate_pairs(docs, "doc_id", max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (1000, 1001) in got          # small-bucket pair survives
    assert all(a >= 1000 for a, _ in got), sorted(got)[:5]  # clones dropped
    assert len(got) < 10
