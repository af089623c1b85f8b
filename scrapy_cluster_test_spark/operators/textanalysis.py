"""Text analysis operators for training-data curation: language-ID
heuristic, quality scoring, token counting, document fingerprinting.

All native Spark SQL expressions (regexp / split / aggregate) — zero
Python in the hot path; each is a narrow map over the documents scan with
at most one shuffle for grouped outputs. DuckDB oracles mirror every
expression exactly (plans/catalog_ml.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic per-language marker tokens for the n-gram/stopword
# heuristic. On real corpora these would be learned char-trigram profiles;
# on the synthetic word-soup corpus the heuristic stays fully exercised
# (scoring, argmax, tiebreak) with deterministic output.
LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "petit"),
    "es": ("el", "la", "y", "rapido"),
    "zh": ("de", "shi", "bu", "le"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _count_token(token: str) -> F.Column:
    """Occurrences of ``token`` as a whole word — via size(split) - 1,
    identical to DuckDB's len(string_split(...)) - 1."""
    return F.size(F.split(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), f" {token} ")) - 1


def lang_id(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker-token counts, ties broken
    by language code order. Output: (id, lang_pred, lang_score)."""
    scores = [
        (sum(_count_token(t) for t in toks)).alias(f"s_{lang}")
        for lang, toks in LANG_MARKERS.items()
    ]
    scored = df.select(id_col, "text", *scores)
    langs = sorted(LANG_MARKERS)  # tiebreak order
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"s_{lang}") == best, F.lit(lang)) for lang in langs]
    )
    return scored.select(
        id_col,
        pred.alias("lang_pred"),
        best.cast("long").alias("lang_score"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Quality features: word count, mean word length, stopword ratio,
    uppercase-start ratio, and a composite score — the standard cheap
    filters a 100 TB text pipeline applies before expensive stages."""
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws)
    n_chars = F.length("text")
    mean_wl = (n_chars - (n_words - 1)).cast("double") / n_words
    stop_hits = sum(_count_token(t) for t in STOPWORDS)
    stop_ratio = stop_hits.cast("double") / n_words
    score = (
        F.when((n_words >= 20) & (n_words <= 1000), 1.0).otherwise(0.0)
        + F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.0)
        + F.when(stop_ratio.between(0.01, 0.6), 1.0).otherwise(0.0)
    )
    return df.select(
        id_col,
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def token_count(df: DataFrame, id_col: str = "doc_id", chunk: int = 4) -> DataFrame:
    """BPE-ish token estimate: each word contributes ceil(len/chunk)
    subword tokens (whitespace tokens = size(split))."""
    ws = F.split(F.col("text"), " ")
    subwords = F.aggregate(
        F.transform(ws, lambda w: F.ceil(F.length(w) / F.lit(float(chunk))).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        id_col,
        F.size(ws).cast("long").alias("ws_tokens"),
        subwords.alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Winnowing-style document fingerprint: minimum salted md5 over word
    n-gram shingles, plus its 60-bit integer form. Near-identical documents
    (sharing their rarest shingle) collide — a cheap pre-cluster key."""
    from .dedupe import shingles_multiset

    # r6 (guide §2.4): min is duplicate-insensitive, so the shingle
    # DISTINCT exchange is dropped — the min partially aggregates
    # map-side and the one exchange carries ~|docs| rows
    sh = shingles_multiset(df, id_col, text_col="text", n=n)
    return sh.groupBy(id_col).agg(
        F.min(F.md5(F.concat(F.lit("fp|"), F.col("shingle")))).alias("fp_hex")
    ).select(
        id_col,
        "fp_hex",
        F.conv(F.substring("fp_hex", 1, 15), 16, 10).cast("long").alias("fp_int"),
    )
