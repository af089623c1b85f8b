"""Payload extractors: one page → N entity rows (the UDTF pattern).

Reference: the HTML-extraction table functions (SURVEY §2.10, X1-X11) —
`get_offers` yields N offer structs per offer-list div
(core/sellgo_core/utils/parser.py:521-528), `get_seller_data` a ~40-field
struct (spiders/amazon_merchant.py:281-545). The graft operates on
image+caption payloads, so the extractor here parses the caption token
stream into typed "offer" structs with identical cardinality semantics:
a vectorized pandas UDF returns ``ArrayType(StructType)``, then native
``explode`` turns each page into N rows — parsing stays Arrow-batched,
row fan-out stays in the JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OFFER = T.StructType(
    [
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("token_id", T.IntegerType(), True),  # numeric part, null if none
        T.StructField("is_prime", T.BooleanType(), False),  # token_id divisible by 7
    ]
)


@F.pandas_udf(T.ArrayType(OFFER))
def parse_offers(caption: pd.Series) -> pd.Series:
    """caption 'caption 7: tok12 tok40 ...' → list of offer structs.
    Vectorized over the Arrow batch; the per-token work is pure pandas/str
    (mirrors get_offers dropping nameless entries — empty tokens skipped).
    """

    def one(c: str):
        body = c.split(":", 1)[1] if ":" in c else c
        out = []
        for pos, tok in enumerate(t for t in body.split() if t):
            digits = "".join(ch for ch in tok if ch.isdigit())
            tid = int(digits) if digits else None
            out.append(
                {
                    "pos": pos,
                    "token": tok,
                    "token_id": tid,
                    "is_prime": bool(tid is not None and tid % 7 == 0),
                }
            )
        return out

    return caption.map(one)


def extract_offer_rows(pages: DataFrame, id_col: str = "image_id") -> DataFrame:
    """pages(image_id, caption) → one row per extracted offer
    (X2 cardinality: page → N offers; nameless dropped)."""
    exploded = pages.select(
        id_col, F.explode(parse_offers(F.col("caption"))).alias("offer")
    )
    return exploded.select(
        id_col,
        F.col("offer.pos").alias("pos"),
        F.col("offer.token").alias("token"),
        F.col("offer.token_id").alias("token_id"),
        F.col("offer.is_prime").alias("is_prime"),
    )


def per_page_rollup(offers: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Per-page rollup (A5 analog): num_offers, num_unique tokens,
    private-label rule = at most one distinct non-prime token (F14)."""
    return offers.groupBy(id_col).agg(
        F.count("*").alias("num_offers"),
        F.countDistinct("token").alias("num_unique_tokens"),
        (
            F.size(F.collect_set(F.when(~F.col("is_prime"), F.col("token")))) <= 1
        ).alias("private_label"),
    )
