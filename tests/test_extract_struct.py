"""Golden-fixture tests for the wide product-page struct extractor —
the graft's analog of the reference's canned-HTML parser tests
(scrapy_project/project/tests/test_amazon_merchant_inventory.py:8-41):
fixed input text, exact expected struct."""

from __future__ import annotations

from scrapy_cluster_test_spark.operators.extract import parse_product_struct

GOLDEN = (
    "17 answered questions | 204 customer reviews | 4.7 out of 5 stars | "
    'Amazons Choice for "tok42" | #1,234 in Home Goods | '
    "Sold by Amazon.com $129.99 | Best Seller in Books | Subscribe & Save: | "
    "UPC: 885909950805 | New (14) from | FB[4.5|great seller] FB[1.0|slow ship] "
)

BARE = "no markers here at all"


def _parse(spark, text):
    df = spark.createDataFrame([(text,)], "page_text string")
    return parse_product_struct(df).select("product.*").collect()[0]


def test_golden_full_page(spark):
    r = _parse(spark, GOLDEN)
    assert r.answered_questions == 17
    assert r.customer_reviews == 204
    assert r.rating == 4.7
    assert r.amazon_choice == "tok42"
    assert r.rank == 1234          # comma stripped, parser.py:259
    assert r.category == "Home Goods"
    assert r.is_amazon_selling is True
    assert r.amazon_price == 129.99
    assert r.best_seller == "Books"
    assert r.subscribe_save is True
    assert r.upcs == "885909950805"
    assert r.number_of_sellers == 14
    fb = [(f.stars, f.comment) for f in r.feedbacks]
    assert fb == [(4.5, "great seller"), (1.0, "slow ship")]


def test_golden_bare_page_defaults(spark):
    """Absent markers → the reference's try/except defaults
    (ints 0, rating 0.0, everything else null/false, empty array)."""
    r = _parse(spark, BARE)
    assert r.answered_questions == 0
    assert r.customer_reviews == 0
    assert r.rating == 0.0
    assert r.amazon_choice is None
    assert r.rank is None and r.category is None
    assert r.is_amazon_selling is False and r.amazon_price is None
    assert r.best_seller is None and r.subscribe_save is False
    assert r.upcs is None and r.number_of_sellers is None
    assert r.feedbacks == []


def test_case_insensitive_amazon_selling(spark):
    r = _parse(spark, "sold by amazon.com $5.00 |")
    assert r.is_amazon_selling is True
    assert r.amazon_price == 5.0


def test_price_requires_amazon_selling(spark):
    """$ amounts on the page do NOT become amazon_price unless the
    sold-by-amazon marker is present (parser.py:283-302 gating)."""
    r = _parse(spark, "some offer $9.99 | 3 customer reviews |")
    assert r.amazon_price is None
    assert r.customer_reviews == 3
