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


def test_seller_struct_golden(spark):
    from scrapy_cluster_test_spark.operators.extract import parse_seller_struct

    url = ("https://www.example.com/sp?seller=A123&asin=B7"
           "&isAmazonFulfilled=1&marketplaceID=M1")
    text = ("SN[Seller 9] LOGO[https://img/3.png] BN[Biz 5] "
            "ADDR[Unit 2|Floor 1|City8|TX|73301|US] PH[+1-555-1234] "
            "SR[4.5 out of 5 stars] RR[1,234 ratings] "
            "RT30[97|12|3|451] RT90[95|10|5|902] RT12M[94|9|4|1800] RTL[93|8|6|5000] ")
    df = spark.createDataFrame([(url, text)], "url string, page_text string")
    r = parse_seller_struct(df).select("seller.*").collect()[0]
    assert (r.seller_id, r.asin, r.fba, r.marketplace_id) == ("A123", "B7", "1", "M1")
    assert r.seller_name == "Seller 9" and r.business_name == "Biz 5"
    # positional split: [-4:-1] = city/state/zip, [-1] = country, rest joined
    assert (r.city, r.state, r.zip_code, r.country) == ("City8", "TX", "73301", "US")
    assert r.address == "Unit 2 Floor 1"
    assert r.seller_rating == 4.5
    assert r.review_ratings == 1234  # digits-only, comma stripped
    assert (r.positive_30_days, r.neutral_30_days, r.negative_30_days, r.count_30_days) == (97, 12, 3, 451)
    assert (r.positive_lifetime, r.count_lifetime) == (93, 5000)


def test_seller_struct_three_segment_address(spark):
    """Python negative-index semantics: a 3-segment address has NO city
    ([-4] raises → None) but [-3]/[-2]/[-1] still resolve
    (amazon_merchant.py:320-345)."""
    from scrapy_cluster_test_spark.operators.extract import parse_seller_struct

    df = spark.createDataFrame(
        [("https://x/sp?seller=A1", "SN[S] ADDR[NY|10001|US] ")],
        "url string, page_text string",
    )
    r = parse_seller_struct(df).select("seller.*").collect()[0]
    assert r.city is None
    assert (r.state, r.zip_code, r.country) == ("NY", "10001", "US")
    assert r.address == ""  # ' '.join([]) — empty, not None
    assert r.asin is None and r.phone is None


def test_offer_rows_native_equals_udf(spark):
    """The native hot path and the pandas-UDF UDTF form must produce the
    identical row set (the UDF form is the pattern-reference for parsers
    regexps can't express)."""
    from scrapy_cluster_test_spark.operators.extract import (
        extract_offer_rows,
        extract_offer_rows_udf,
    )

    docs = spark.createDataFrame(
        [("d1", "caption 7: tok12  tok40 x7y"), ("d2", "no colon stream tok21"),
         ("d3", "caption 9:"), ("d4", "")],
        "image_id string, caption string",
    )
    nat = sorted(map(tuple, extract_offer_rows(docs).collect()))
    udf = sorted(map(tuple, extract_offer_rows_udf(docs).collect()))
    assert nat == udf


# ---------------------------------------------------------------------------
# X7-X10 inventory extractor golden fixtures
# ---------------------------------------------------------------------------

from scrapy_cluster_test_spark.operators.extract import parse_inventory  # noqa: E402

INV_GOLDEN = (
    "1-16 of over 2,000 results | BRAND(acme) BRAND(apex) "
    "CARD{PRIME href=/widget/dp/B000012345/ref=sr_1 name=widget "
    "PRICE[$12.99] WAS[$19.99] 4.3 out of 5 stars reviews=88 Best Seller "
    "Save more with Subscribe & Save cat=tools} "
    "CARD{href=/gizmo-set/dp/B000099999/extra/ref=sr_2 name=gizmo "
    "PRICE[$5.00] reviews=3 Amazon Choice Price may vary by} "
)


def _inv(spark, text):
    df = spark.createDataFrame([(text,)], "page_text string")
    return parse_inventory(df).collect()[0]


def test_inventory_golden(spark):
    r = _inv(spark, INV_GOLDEN)
    # X8/X10 result-info bar: digits of the token before 'results'
    assert r.inventory_count == 2000
    assert r.brands == ["acme", "apex"]
    assert len(r.products) == 2  # X10 card splitter
    a, b = r.products
    assert a.asin == "B000012345"
    # X7/X9 asin rule is rindex('/'): an extra path segment after the
    # asin stays IN the slice, exactly like the reference
    # (amazon_merchant.py:196-204)
    assert b.asin == "B000099999/extra"
    assert a.product_name == "widget"
    assert a.product_url == "https://www.amazon.com/widget/dp/B000012345/ref=sr_1"
    assert a.current_price == "$12.99"
    assert a.original_price == "$19.99"
    assert b.original_price is None
    assert a.best_seller is True and b.best_seller is False
    assert a.amazon_choice is False and b.amazon_choice is True
    assert a.reviews_count == "88"
    assert a.review_stars == 4.3 and b.review_stars is None
    assert a.save_and_subscribe is True and b.save_and_subscribe is False
    assert a.variation is False and b.variation is True
    assert a.category == "tools" and b.category is None
    assert (a.fba, a.fbm) == (True, False)  # prime icon → FBA
    assert (b.fba, b.fbm) == (False, True)
    assert a.marketplace_id == "ATVPDKIKX0DER"
    assert a.jobid == "job-0" and a.total_expected_len == 2


def test_inventory_count_phrasings(spark):
    # the reference's three result-bar branches (amazon_merchant.py:208-240)
    for text, want in [
        ("1-16 of over 1,234 results | ", 1234),
        ("1-16 of 345 results | ", 345),
        ("77 results | ", 77),
        ("no results bar at all", 0),
    ]:
        assert _inv(spark, text).inventory_count == want, text


def test_inventory_empty_page(spark):
    r = _inv(spark, "")
    assert r.inventory_count == 0
    assert r.brands == [] and r.products == []
