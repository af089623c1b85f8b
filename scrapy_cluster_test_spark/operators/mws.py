"""MWS-style report table functions (SURVEY §2.10 X11).

Reference: core/sellgo_core/utils/parser.py:14-88 walks nested
GetCompetitivePricing report dicts into flat price-row lists, with the
recurring MWS quirk that any repeated element arrives as EITHER one dict
OR a list of dicts (parse_data/parse_single isinstance branches,
parser.py:15-19,28-34).

Spark-first form: the report is a JSON column; ``get_json_object`` pulls
the repeated element's raw JSON, a ``when(startswith('['))`` wraps the
single-object case into a one-element array (the isinstance branch,
natively), and ``from_json`` against an EXPLICIT nested schema +
``posexplode`` produce typed rows. No UDF, no schema inference — the
whole parse stays in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _sv() -> T.StructType:  # MWS's {"value": "..."} wrapper
    return T.StructType([T.StructField("value", T.StringType())])


COMPETITIVE_PRICE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("condition", _sv()),
            T.StructField("subcondition", _sv()),
            T.StructField("CompetitivePriceId", _sv()),
            T.StructField(
                "Price",
                T.StructType(
                    [
                        T.StructField(
                            "LandedPrice",
                            T.StructType(
                                [
                                    T.StructField("CurrencyCode", _sv()),
                                    T.StructField("Amount", _sv()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "ListingPrice",
                            T.StructType([T.StructField("Amount", _sv())]),
                        ),
                        T.StructField(
                            "Shipping",
                            T.StructType([T.StructField("Amount", _sv())]),
                        ),
                    ]
                ),
            ),
        ]
    )
)


def _price_obj(k: F.Column, j: int) -> F.Column:
    """One CompetitivePrice JSON object for price index j, built natively."""
    cond = "New" if j % 2 == 0 else "Used"
    subcond = "Mint" if j % 2 == 0 else "Good"
    landed = (k % 1000).cast("double") / 100 + j
    listing = landed - 0.5
    shipping = F.lit(j * 0.25)
    return F.concat(
        F.lit(
            '{"condition":{"value":"%s"},"subcondition":{"value":"%s"},'
            '"CompetitivePriceId":{"value":"' % (cond, subcond)
        ),
        (k * 10 + j).cast("string"),
        F.lit('"},"Price":{"LandedPrice":{"CurrencyCode":{"value":"USD"},"Amount":{"value":"'),
        landed.cast("string"),
        F.lit('"}},"ListingPrice":{"Amount":{"value":"'),
        listing.cast("string"),
        F.lit('"}},"Shipping":{"Amount":{"value":"'),
        shipping.cast("string"),
        F.lit('"}}}}'),
    )


def synth_pricing_report(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic MWS-shaped report JSON per row: id%3 == 0 → the
    CompetitivePrice key is ABSENT; == 1 → a SINGLE OBJECT (the isinstance
    quirk); == 2 → a two-element LIST. Mirrors the shapes the reference's
    fixtures feed parse_data."""
    k = F.col(id_col)
    n = k % 3
    # single-reference branches (r6): the old form bound `payload` into
    # both the isNotNull probe AND the concat, inlining the whole price
    # synth expression twice per row in the physical Project — same bytes,
    # half the expression evaluation
    pre = '{"Product":{"CompetitivePricing":{"CompetitivePrices":{"CompetitivePrice":'
    body = (
        F.when(n == 1, F.concat(F.lit(pre), _price_obj(k, 0), F.lit("}}}}")))
        .when(
            n == 2,
            F.concat(
                F.lit(pre + "["),
                _price_obj(k, 0),
                F.lit(","),
                _price_obj(k, 1),
                F.lit("]}}}}"),
            ),
        )
        .otherwise(F.lit('{"Product":{"CompetitivePricing":{"CompetitivePrices":{}}}}'))
    )
    return df.withColumn("report_json", body)


def parse_competitive_pricing(
    reports: DataFrame, json_col: str, id_col: str
) -> DataFrame:
    """Nested report JSON → typed price rows (parser.py:22-88 as a table
    function). Single-object payloads are wrapped into one-element arrays
    before from_json — the reference's isinstance(list) normalization."""
    # materialize the extracted payload as its OWN projection (r6): the old
    # single-expression form referenced `raw` three times (isNotNull probe,
    # startswith probe, concat), so the physical Generate re-ran the full
    # get_json_object document parse 3× per row; as a multi-referenced
    # non-cheap attribute it stays un-inlined (one parse), and the
    # isNotNull guard is redundant — a NULL payload null-propagates
    # through concat and from_json, and posexplode drops null arrays
    raw = F.get_json_object(
        F.col(json_col),
        "$.Product.CompetitivePricing.CompetitivePrices.CompetitivePrice",
    )
    step = reports.select(F.col(id_col).alias("product_id"), raw.alias("_raw"))
    wrapped = F.when(F.col("_raw").startswith("["), F.col("_raw")).otherwise(
        F.concat(F.lit("["), F.col("_raw"), F.lit("]"))
    )
    exploded = step.select(
        "product_id",
        F.posexplode(F.from_json(wrapped, COMPETITIVE_PRICE_SCHEMA)).alias(
            "price_idx", "p"
        ),
    )
    return exploded.select(
        "product_id",
        F.col("price_idx").cast("int").alias("price_idx"),
        F.col("p.condition.value").alias("condition"),
        F.col("p.subcondition.value").alias("subcondition"),
        F.col("p.CompetitivePriceId.value").alias("competitive_price_id"),
        F.col("p.Price.LandedPrice.CurrencyCode.value").alias("landed_currency"),
        F.col("p.Price.LandedPrice.Amount.value").cast("double").alias("landed_amount"),
        F.col("p.Price.ListingPrice.Amount.value").cast("double").alias("listing_amount"),
        F.col("p.Price.Shipping.Amount.value").cast("double").alias("shipping_amount"),
    )
