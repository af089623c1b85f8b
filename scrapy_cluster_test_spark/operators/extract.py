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
    (X2 cardinality: page → N offers; nameless dropped).

    NATIVE hot path (split/filter/posexplode/regexp — whole-stage
    codegen'd; r1's Arrow round trip cost 3× at sf0.1). The pandas-UDF
    form (:func:`parse_offers` + :func:`extract_offer_rows_udf`) remains
    as the UDTF pattern for parsers regexps can't express, with an
    equivalence test pinning the two outputs together."""
    body = F.when(
        F.instr("caption", ":") > 0,
        F.expr("substring(caption, instr(caption, ':') + 1)"),
    ).otherwise(F.col("caption"))
    tokens = F.filter(F.split(body, " "), lambda t: t != "")
    exploded = pages.select(id_col, F.posexplode(tokens).alias("pos", "token"))
    digits = F.regexp_replace("token", "[^0-9]", "")
    token_id = F.nullif(digits, F.lit("")).try_cast("int")
    return exploded.select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        "token",
        token_id.alias("token_id"),
        F.coalesce((token_id % 7 == 0), F.lit(False)).alias("is_prime"),
    )


def extract_offer_rows_udf(pages: DataFrame, id_col: str = "image_id") -> DataFrame:
    """The Arrow-batched pandas-UDF form of :func:`extract_offer_rows` —
    same contract, kept as the X1-X3 UDTF pattern for parsers that
    genuinely need Python (equivalence asserted in tests)."""
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


# ---------------------------------------------------------------------------
# Wide-struct product-page extractor (SURVEY X5/X6/X9)
# ---------------------------------------------------------------------------

PRODUCT_FIELDS = [
    "marketplace_id", "answered_questions", "customer_reviews", "rating",
    "amazon_choice", "rank", "category", "is_amazon_selling", "amazon_price",
    "best_seller", "subscribe_save", "upcs", "number_of_sellers", "feedbacks",
]


def parse_product_struct(pages: DataFrame, text_col: str = "page_text") -> DataFrame:
    """Product-page text → one wide typed struct per page (the analog of
    parse_amazon_product_listing_page, core/sellgo_core/utils/parser.py:
    191-431: 13 scalar fields + the nested feedback array of
    amazon_merchant.py:470-484). All extraction is NATIVE regexp — 14
    fields cost one codegen'd projection, no UDF, no HTML library.

    Field semantics track the reference exactly:
      * int counters default to 0 when the marker is absent
        (parser.py try/except → 0);
      * rank strips thousands commas before the cast (parser.py:259);
      * rating/price are null-safe float casts;
      * is_amazon_selling is a case-insensitive substring test
        (parser.py:291-302);
      * feedbacks is ArrayType(Struct(stars, comment)) — the X6 nested
        array — parsed with regexp_extract_all + transform.
    """
    t = F.col(text_col)

    def _int0(pat: str) -> F.Column:  # absent marker → 0, reference default
        return F.coalesce(
            F.regexp_extract(t, pat, 1).try_cast("int"), F.lit(0)
        )

    fb_matches = F.expr(
        rf"regexp_extract_all({text_col}, 'FB\\[([0-9.]+)\\|([^\\]]*)\\]', 0)"
    )
    feedbacks = F.transform(
        fb_matches,
        lambda m: F.struct(
            F.regexp_extract(m, r"FB\[([0-9.]+)\|", 1).cast("double").alias("stars"),
            F.regexp_extract(m, r"\|([^\]]*)\]", 1).alias("comment"),
        ),
    )
    sells = F.lower(t).contains("sold by amazon.com")
    product = F.struct(
        F.lit("US-1").alias("marketplace_id"),
        _int0(r"(\d+) answered questions").alias("answered_questions"),
        _int0(r"(\d+) customer reviews").alias("customer_reviews"),
        F.coalesce(
            F.regexp_extract(t, r"([0-9.]+) out of 5 stars", 1).try_cast("double"),
            F.lit(0.0),
        ).alias("rating"),
        F.nullif(F.regexp_extract(t, r'Choice for "([^"]+)"', 1), F.lit("")).alias(
            "amazon_choice"
        ),
        F.regexp_replace(F.regexp_extract(t, r"#([\d,]+) in ", 1), ",", "")
        .try_cast("int")
        .alias("rank"),
        F.nullif(F.regexp_extract(t, r"#[\d,]+ in ([A-Za-z ]+?) \|", 1), F.lit("")).alias(
            "category"
        ),
        sells.alias("is_amazon_selling"),
        F.when(
            sells, F.regexp_extract(t, r"\$([0-9.]+)", 1).try_cast("double")
        ).alias("amazon_price"),
        F.nullif(F.regexp_extract(t, r"Best Seller in ([A-Za-z ]+?) \|", 1), F.lit("")).alias(
            "best_seller"
        ),
        t.contains("Subscribe & Save:").alias("subscribe_save"),
        F.nullif(F.regexp_extract(t, r"UPC: (\d+)", 1), F.lit("")).alias("upcs"),
        F.regexp_extract(t, r"New \((\d+)\) from", 1).try_cast("int").alias(
            "number_of_sellers"
        ),
        feedbacks.alias("feedbacks"),
    )
    return pages.withColumn("product", product)


def parse_seller_struct(
    pages: DataFrame, url_col: str = "url", text_col: str = "page_text"
) -> DataFrame:
    """Seller-profile page → the ~30-field typed struct of the reference's
    get_seller_data (spiders/amazon_merchant.py:281-545), all native:

    * URL query params (seller/asin/isAmazonFulfilled/marketplaceID) via
      regexp — the parse_qs probes (amazon_merchant.py:283-296);
    * POSITIONAL address split: segments[-4:-1] are city/state/zip and
      [-1] is country, with Python's negative-indexing semantics preserved
      (a 3-segment list has NO city but [-3] still resolves — guarded
      size checks reproduce the IndexError→None vs valid-negative-index
      distinction, amazon_merchant.py:320-345);
    * the 4×4 feedback-rating table (30d/90d/12m/lifetime ×
      positive/neutral/negative/count, amazon_merchant.py:358-470) as 16
      typed columns;
    * seller_rating truncated at 'out' (amazon_merchant.py:350-352),
      review count digits-only (354-357).
    """
    u, t = F.col(url_col), F.col(text_col)

    def qparam(name: str) -> F.Column:
        return F.nullif(F.regexp_extract(u, rf"[?&]{name}=([^&#]+)", 1), F.lit(""))

    # nullif: a page with NO address block yields null segments → every
    # address field null (the reference's business_addresses=None branch),
    # never ''-typed ghosts
    segs = F.split(
        F.nullif(F.regexp_extract(t, r"ADDR\[([^\]]*)\]", 1), F.lit("")), r"\|"
    )
    n = F.size(segs)

    def seg_from_end(off: int) -> F.Column:  # [-off] with IndexError→None
        return F.when(n >= off, F.element_at(segs, -off))

    def rt(tag: str, pos: int) -> F.Column:
        return F.regexp_extract(
            t, rf"RT{tag}\[([0-9]+)\|([0-9]+)\|([0-9]+)\|([0-9]+)\]", pos
        ).try_cast("int")

    rt_fields = [
        rt(tag, pos).alias(f"{pol}_{suffix}")
        for tag, suffix in (("30", "30_days"), ("90", "90_days"),
                            ("12M", "12_month"), ("L", "lifetime"))
        for pos, pol in ((1, "positive"), (2, "neutral"), (3, "negative"),
                         (4, "count"))
    ]
    seller = F.struct(
        qparam("seller").alias("seller_id"),
        qparam("asin").alias("asin"),
        qparam("isAmazonFulfilled").alias("fba"),
        qparam("marketplaceID").alias("marketplace_id"),
        F.nullif(F.regexp_extract(t, r"SN\[([^\]]*)\]", 1), F.lit("")).alias("seller_name"),
        F.nullif(F.regexp_extract(t, r"LOGO\[([^\]]*)\]", 1), F.lit("")).alias("seller_logo"),
        F.nullif(F.regexp_extract(t, r"BN\[([^\]]*)\]", 1), F.lit("")).alias("business_name"),
        # ' '.join(segments[:-4]) — '' when ≤4 segments, like the reference
        F.array_join(
            F.slice(segs, 1, F.greatest(n - 4, F.lit(0))), " "
        ).alias("address"),
        seg_from_end(4).alias("city"),
        seg_from_end(3).alias("state"),
        seg_from_end(2).alias("zip_code"),
        seg_from_end(1).alias("country"),
        F.nullif(F.regexp_extract(t, r"PH\[([^\]]*)\]", 1), F.lit("")).alias("phone"),
        F.regexp_extract(t, r"SR\[([0-9.]+) out of", 1).try_cast("double").alias(
            "seller_rating"
        ),
        F.nullif(
            F.regexp_replace(F.regexp_extract(t, r"RR\[([^\]]*)\]", 1), r"[^0-9]", ""),
            F.lit(""),
        ).try_cast("int").alias("review_ratings"),
        *rt_fields,
    )
    return pages.withColumn("seller", seller)


# ---------------------------------------------------------------------------
# Inventory-page extractor family (SURVEY X7-X10)
# ---------------------------------------------------------------------------

INVENTORY_JOB_FIELDS = ("jobid", "project", "spider")


def parse_inventory(
    pages: DataFrame,
    text_col: str = "page_text",
    jobid: str = "job-0",
    project: str = "project",
    spider: str = "inventory",
) -> DataFrame:
    """X7-X10 parity over synthetic inventory-page text, all NATIVE regexp:

    * X10 ``get_products``: the card splitter — ``CARD[...]`` segments
      play the reference's product-card divs
      (amazon_merchant_inventory.py:150-191); ``regexp_extract_all`` +
      a per-element ``transform`` lambda keep the whole fan-out JVM-side.
    * X10/X8 ``get_inventory_count``: the result-info bar parse with the
      reference's three phrasings ('of over 2,000 results',
      'of 345 results', bare '345 results') — all collapse to the digits
      of the token before 'results' (amazon_merchant.py:208-256).
    * X8 ``get_inventory_info``: {inventory_count, brands[], asins[]} —
      brands from ``BRAND(...)`` refinement tokens.
    * X7 ``get_asins_from_inventory`` / X9 asin rule: the asin is the
      href slice after 'dp/' up to the LAST slash (``rindex('/')``) —
      a single greedy ``dp/(.+)/`` capture reproduces it exactly.
    * X9 ``get_product_data``: the 20-field per-card struct (asin, name,
      absolute url, prices, badges, reviews, stars float with the
      ' out of 5 stars' suffix stripped, subscribe&save / variation
      flags, category, fba/fbm from the prime icon, marketplace + job
      context fields), defaults matching the reference
      (amazon_merchant_inventory.py:64-148).

    Returns the input plus ``inventory_count int``, ``brands
    array<string>`` and ``products array<struct>`` columns; explode
    ``products`` for the one-row-per-card table-function form.
    """
    t = F.col(text_col)
    count = (
        F.nullif(
            F.regexp_replace(
                F.regexp_extract(t, r"([0-9][0-9,]*) results", 1), ",", ""
            ),
            F.lit(""),
        )
        .try_cast("int")
    )
    brands = F.expr(rf"regexp_extract_all({text_col}, 'BRAND\\(([^)]*)\\)', 1)")
    # cards delimit with braces because card bodies contain PRICE[...]-style
    # bracket tokens — [^}] scans to the card's own terminator only
    cards = F.expr(rf"regexp_extract_all({text_col}, 'CARD\\{{([^}}]*)\\}}', 1)")

    def card_struct(c: F.Column) -> F.Column:
        href = F.regexp_extract(c, r"href=([^ ]+)", 1)
        stars = F.regexp_extract(c, r"([0-9]\.[0-9]) out of 5 stars", 1)
        is_fba = c.contains("PRIME")
        return F.struct(
            F.lit(jobid).alias("jobid"),
            F.lit(project).alias("project"),
            F.lit(spider).alias("spider"),
            F.size(cards).cast("int").alias("total_expected_len"),
            F.size(cards).cast("int").alias("scraped_items_len"),
            F.regexp_extract(href, r"dp/(.+)/", 1).alias("asin"),
            F.nullif(F.regexp_extract(c, r"name=([^ ]+)", 1), F.lit("")).alias(
                "product_name"
            ),
            F.concat(F.lit("https://www.amazon.com"), href).alias("product_url"),
            F.nullif(F.regexp_extract(c, r"PRICE\[([^\]]*)\]", 1), F.lit("")).alias(
                "current_price"
            ),
            F.nullif(F.regexp_extract(c, r"WAS\[([^\]]*)\]", 1), F.lit("")).alias(
                "original_price"
            ),
            c.contains("Best Seller").alias("best_seller"),
            c.contains("Amazon Choice").alias("amazon_choice"),
            F.nullif(F.regexp_extract(c, r"reviews=(\d+)", 1), F.lit("")).alias(
                "reviews_count"
            ),
            stars.try_cast("double").alias("review_stars"),
            c.contains("Save more with Subscribe & Save").alias(
                "save_and_subscribe"
            ),
            c.contains("Price may vary by").alias("variation"),
            F.nullif(F.regexp_extract(c, r"cat=([^ \]]+)", 1), F.lit("")).alias(
                "category"
            ),
            is_fba.alias("fba"),
            (~is_fba).alias("fbm"),
            F.lit("ATVPDKIKX0DER").alias("marketplace_id"),
        )

    return pages.select(
        "*",
        F.coalesce(count, F.lit(0)).alias("inventory_count"),
        brands.alias("brands"),
        F.transform(cards, card_struct).alias("products"),
    )
