"""Training-data pipeline queries (dedup / similarity / text analysis)
registered into the main catalog, each with a DuckDB oracle over the
driver-provided ``documents`` and ``embeddings`` tables.

Cross-engine determinism: string hashes are md5 (identical); integer
hashes parse md5 hex prefixes; float cosines fold element-by-element in
BOTH engines (Spark ``aggregate`` vs DuckDB ``sum(... ORDER BY i)``) so
they are bit-identical and rank windows agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedupe, similarity, textanalysis
from ..sources import tables
from .catalog import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "documents")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents hash-spread to full parallelism — for the queries whose
    map stage does real per-row work (shingle/md5/regex families); the
    driver files' 1-2 row groups otherwise cap those stages at 1-2 tasks
    (tables.load_spread docstring has the full rationale)."""
    return tables.load_spread(spark, sf_dir, "documents", "doc_id")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "embeddings")


_SHINGLES_SQL = """
    w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
    sh0 AS (SELECT doc_id, concat_ws(' ', ws[i], ws[i+1], ws[i+2]) AS shingle
            FROM w, LATERAL unnest(generate_series(1, len(ws)-2)) AS t(i)),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0)
"""


@query(
    "dedup_exact_hash",
    """
    SELECT md5(text) AS content_hash,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy, keeper = min id (SURVEY D4/D6
    generalized to content). One shuffle on the 128-bit content hash."""
    return dedupe.exact_dedup_groups(_docs(spark, sf_dir), "doc_id")


# the production bucket cap, and it BITES at the driver scales: max bucket
# is 6 at sf0.001 / 5 at sf0.01, so capped output genuinely differs from
# uncapped — the oracle checks the cap semantics, not a no-op
MINHASH_BUCKET_CAP = 4


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {_SHINGLES_SQL},
    sig AS (SELECT doc_id,
            min(md5(concat('b0|', shingle))) AS h0,
            min(md5(concat('b1|', shingle))) AS h1,
            min(md5(concat('b2|', shingle))) AS h2,
            min(md5(concat('b3|', shingle))) AS h3
            FROM sh GROUP BY doc_id),
    long AS (SELECT doc_id, concat('0|', h0) AS bucket FROM sig UNION ALL
             SELECT doc_id, concat('1|', h1) FROM sig UNION ALL
             SELECT doc_id, concat('2|', h2) FROM sig UNION ALL
             SELECT doc_id, concat('3|', h3) FROM sig),
    keep AS (SELECT bucket FROM long
             GROUP BY bucket HAVING count(*) <= {{cap}}),
    lk AS (SELECT l.doc_id, l.bucket FROM long l JOIN keep k USING (bucket))
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM lk a JOIN lk b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    """.replace("{cap}", str(MINHASH_BUCKET_CAP)),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates WITH the production bucket cap:
    word-trigram shingles → per-band minhash (lexicographic min of salted
    md5 — a valid permutation family needing no integer conversion) →
    bucket self-join with buckets larger than MINHASH_BUCKET_CAP dropped
    before the quadratic join (dedupe.lsh_candidate_pairs
    ``max_bucket_size`` — the degenerate-bucket gate a 100-TB run needs;
    docs in a dropped bucket still pair through their other bands) →
    distinct pairs. The oracle mirrors the cap as a HAVING on bucket
    size, so the gated semantics are the driver-checked ones; the
    uncapped form stays available via max_bucket_size=None."""
    return dedupe.lsh_candidate_pairs(
        _docs_spread(spark, sf_dir), "doc_id", max_bucket_size=MINHASH_BUCKET_CAP
    ).select(F.col("id_a").cast("long"), F.col("id_b").cast("long"))


@query(
    "dedup_simhash",
    """
    WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
    h AS (SELECT doc_id, CAST(concat('0x', substr(md5(word),1,8)) AS BIGINT) AS h FROM w),
    bits AS (SELECT doc_id, b,
                    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
             FROM h, LATERAL unnest(generate_series(0, 31)) AS t(b)
             GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document (token votes per bit). Hamming-close
    simhashes → near-dups; the hash itself is the oracle-checked output."""
    return dedupe.simhash(_docs(spark, sf_dir), "doc_id")


@query(
    "lsh_bucket_skew",
    f"""
    WITH {_SHINGLES_SQL},
    sig AS (SELECT doc_id,
            min(md5(concat('b0|', shingle))) AS h0,
            min(md5(concat('b1|', shingle))) AS h1,
            min(md5(concat('b2|', shingle))) AS h2,
            min(md5(concat('b3|', shingle))) AS h3
            FROM sh GROUP BY doc_id),
    long AS (SELECT concat(b.b, '|', CASE b.b WHEN '0' THEN h0 WHEN '1' THEN h1
                                              WHEN '2' THEN h2 ELSE h3 END) AS bucket
             FROM sig, LATERAL unnest(['0','1','2','3']) AS b(b)),
    sizes AS (SELECT bucket, count(*) AS s FROM long GROUP BY bucket)
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(s) AS BIGINT) AS max_bucket,
           CAST(quantile_cont(s, 0.99) AS DOUBLE) AS p99_bucket,
           CAST(sum(s * (s - 1) / 2) AS BIGINT) AS est_pairs
    FROM sizes
    """,
)
def lsh_bucket_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-size skew diagnostics for the LSH candidate join: max/p99
    bucket size and est_pairs = Σ s(s-1)/2, the exact pair-count the join
    would emit — the pre-flight gate a 100-TB dedup runs before the
    quadratic-in-bucket-size self-join."""
    return dedupe.lsh_bucket_stats(_docs_spread(spark, sf_dir), "doc_id")


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_SQL},
    pairs AS (SELECT d1.doc_id AS id_a, d2.doc_id AS id_b
              FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT p.id_a, p.id_b, count(*) AS i_n
              FROM pairs p
              JOIN sh a ON a.doc_id = p.id_a
              JOIN sh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
              GROUP BY p.id_a, p.id_b)
    SELECT p.id_a, p.id_b,
           CAST(coalesce(i_n, 0) AS BIGINT) AS inter,
           CAST(sa.sz + sb.sz - coalesce(i_n, 0) AS BIGINT) AS union_n,
           CAST(coalesce(i_n, 0) AS DOUBLE) / CAST(sa.sz + sb.sz - coalesce(i_n, 0) AS DOUBLE) AS jaccard
    FROM pairs p
    LEFT JOIN inter USING (id_a, id_b)
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram Jaccard over a bounded candidate pair set (adjacent
    ids here; LSH candidates in production — never the cross product).
    NOT spread (r6): under the bench's count() the intersection subtree
    is pruned (a left join cannot change the row count), so the spread
    exchange would tax the measured path without feeding any heavy map."""
    d = _docs(spark, sf_dir)
    ids = d.select("doc_id")
    pairs = (
        ids.select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
        .join(ids.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
    )
    return dedupe.ngram_jaccard_pairs(d, "doc_id", pairs)


_EMB_EXPAND_SQL = """
    ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)),
    nrm AS (SELECT vec_id, sqrt(sum(x * x ORDER BY i)) AS nr FROM ex GROUP BY vec_id)
"""


@query("embedding_neardup_pairs", similarity.neardup_oracle_sql())
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, 100-TB shape: LSH bucket
    equi-join (md5-derived hyperplanes, mirrored exactly by the DuckDB
    oracle) restricts candidates, exact ordered-fold cosine verifies — no
    CartesianProduct anywhere in the plan (asserted in tests/test_plans).
    Recall vs the brute-force cross join is measured (0.93 at sf0.1,
    tests/test_similarity.py), not assumed."""
    return similarity.neardup_pairs_lsh(_embs(spark, sf_dir))


def embedding_neardup_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-side recall reference ONLY (not registered): the r1 all-pairs
    crossJoin — O(N²), a scale-killer kept solely to measure the LSH
    operator's recall against exact truth."""
    e = _embs(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        similarity.norm_col(F.col("embedding")).alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        similarity.norm_col(F.col("embedding")).alias("norm_b"),
    )
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cosine = similarity.dot_cols("emb_a", "emb_b") / (
        F.col("norm_a") * F.col("norm_b")
    )
    return pairs.filter(cosine >= 0.38).select("vec_a", "vec_b")


@query("ann_cosine_topk_lsh", similarity.ann_topk_oracle_sql())
def ann_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate cosine top-5 for the query subset (vec_id%50==0) via
    the md5-plane LSH bucket equi-join — the 100-TB-shaped ANN operator
    (no CartesianProduct, asserted in tests/test_plans.py). Recall vs the
    exact crossJoin baseline (``ann_cosine_topk_exact``, unregistered) is
    measured in tests/test_similarity.py."""
    e = _embs(spark, sf_dir)
    return similarity.ann_topk_lsh(e, e.filter(F.col("vec_id") % 50 == 0), k=5)


def ann_cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-side recall reference ONLY (not registered): exact brute-force
    cosine top-5 for the same query subset — O(N²/50) crossJoin, kept
    solely to measure ``ann_cosine_topk_lsh``'s recall against exact
    truth (the same split as embedding_neardup_bruteforce)."""
    e = _embs(spark, sf_dir)
    return similarity.brute_force_topk(
        e, e.filter(F.col("vec_id") % 50 == 0), k=5
    )


@query(
    "lang_id_heuristic",
    """
    WITH s AS (
      SELECT doc_id,
        len(string_split(' ' || text || ' ', ' der ')) - 1
          + len(string_split(' ' || text || ' ', ' die ')) - 1
          + len(string_split(' ' || text || ' ', ' das ')) - 1
          + len(string_split(' ' || text || ' ', ' und ')) - 1 AS s_de,
        len(string_split(' ' || text || ' ', ' the ')) - 1
          + len(string_split(' ' || text || ' ', ' a ')) - 1
          + len(string_split(' ' || text || ' ', ' fast ')) - 1
          + len(string_split(' ' || text || ' ', ' slow ')) - 1 AS s_en,
        len(string_split(' ' || text || ' ', ' el ')) - 1
          + len(string_split(' ' || text || ' ', ' la ')) - 1
          + len(string_split(' ' || text || ' ', ' y ')) - 1
          + len(string_split(' ' || text || ' ', ' rapido ')) - 1 AS s_es,
        len(string_split(' ' || text || ' ', ' le ')) - 1
          + len(string_split(' ' || text || ' ', ' la ')) - 1
          + len(string_split(' ' || text || ' ', ' et ')) - 1
          + len(string_split(' ' || text || ' ', ' petit ')) - 1 AS s_fr,
        len(string_split(' ' || text || ' ', ' de ')) - 1
          + len(string_split(' ' || text || ' ', ' shi ')) - 1
          + len(string_split(' ' || text || ' ', ' bu ')) - 1
          + len(string_split(' ' || text || ' ', ' le ')) - 1 AS s_zh
      FROM documents)
    SELECT doc_id,
           CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                ELSE 'zh' END AS lang_pred,
           CAST(greatest(s_de, s_en, s_es, s_fr, s_zh) AS BIGINT) AS lang_score
    FROM s
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID: deterministic score-argmax with code-order
    tiebreak. (Real corpora swap the marker lists for char-trigram
    profiles; the dataflow is identical.)"""
    return textanalysis.lang_id(_docs(spark, sf_dir))


@query(
    "text_quality_score",
    """
    WITH f AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             length(text) AS n_chars,
             len(string_split(' ' || text || ' ', ' the ')) - 1
               + len(string_split(' ' || text || ' ', ' a ')) - 1
               + len(string_split(' ' || text || ' ', ' of ')) - 1
               + len(string_split(' ' || text || ' ', ' and ')) - 1
               + len(string_split(' ' || text || ' ', ' to ')) - 1
               + len(string_split(' ' || text || ' ', ' in ')) - 1 AS stop_hits
      FROM documents)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
           CAST(stop_hits AS DOUBLE) / n_words AS stopword_ratio,
           CAST(CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END
            + CASE WHEN CAST(stop_hits AS DOUBLE) / n_words BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS quality_score
    FROM f
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality gates (length, word shape, stopword ratio) — the
    first-pass filter of a 100 TB text pipeline."""
    return textanalysis.quality_score(_docs(spark, sf_dir))


@query(
    "token_count_bpeish",
    """
    WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS ws_tokens,
           CAST(sum(ceil(length(word) / 4.0)) AS BIGINT) AS bpe_tokens
    FROM w GROUP BY doc_id
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish ceil(len/4) subword
    estimate, computed with array fold (no explode-shuffle in Spark)."""
    return textanalysis.token_count(_docs(spark, sf_dir))


@query(
    "doc_fingerprint",
    f"""
    WITH {_SHINGLES_SQL},
    fp AS (SELECT doc_id, min(md5(concat('fp|', shingle))) AS fp_hex
           FROM sh GROUP BY doc_id)
    SELECT doc_id, fp_hex,
           CAST(concat('0x', substr(fp_hex, 1, 15)) AS BIGINT) AS fp_int
    FROM fp
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-shingle fingerprint (hex + 60-bit int form)."""
    return textanalysis.fingerprint(_docs_spread(spark, sf_dir))


_PAGE_TEXT_SQL = """
    pg AS (
      SELECT doc_id,
        CASE WHEN doc_id % 5 <> 0
             THEN CAST(doc_id % 300 AS VARCHAR) || ' answered questions | ' ELSE '' END
        || CAST(doc_id % 500 AS VARCHAR) || ' customer reviews | '
        || CAST((doc_id % 45 + 5) // 10 AS VARCHAR) || '.' || CAST((doc_id % 45 + 5) % 10 AS VARCHAR)
           || ' out of 5 stars | '
        || CASE WHEN doc_id % 4 = 0
             THEN 'Amazons Choice for "tok' || CAST(doc_id % 100 AS VARCHAR) || '" | ' ELSE '' END
        || CASE WHEN doc_id % 6 <> 0
             THEN '#' || CASE WHEN doc_id % 6 = 2 THEN '1,234'
                              ELSE CAST(doc_id % 900 + 100 AS VARCHAR) END
                  || ' in ' || (['Books','Home Goods','Toys'])[CAST(doc_id % 3 AS INT) + 1]
                  || ' | ' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
             THEN CASE WHEN doc_id % 8 = 0 THEN 'sold by amazon.com' ELSE 'Sold by Amazon.com' END
                  || ' $' || CAST((doc_id % 10000 + 99) // 100 AS VARCHAR) || '.'
                  || lpad(CAST((doc_id % 10000 + 99) % 100 AS VARCHAR), 2, '0') || ' | ' ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN 'Best Seller in Books | ' ELSE '' END
        || CASE WHEN doc_id % 9 = 0 THEN 'Subscribe & Save: | ' ELSE '' END
        || CASE WHEN doc_id % 10 = 0 THEN 'UPC: ' || CAST(doc_id * 7 AS VARCHAR) || ' | ' ELSE '' END
        || CASE WHEN doc_id % 11 = 0 THEN 'New (' || CAST(doc_id % 50 + 1 AS VARCHAR) || ') from | ' ELSE '' END
        || CASE WHEN doc_id % 3 >= 1
             THEN 'FB[' || CAST((doc_id % 50) // 10 AS VARCHAR) || '.' || CAST((doc_id % 50) % 10 AS VARCHAR)
                  || '|c' || CAST(doc_id % 7 AS VARCHAR) || '] ' ELSE '' END
        || CASE WHEN doc_id % 3 = 2
             THEN 'FB[' || CAST(((doc_id + 1) % 50) // 10 AS VARCHAR) || '.' || CAST(((doc_id + 1) % 50) % 10 AS VARCHAR)
                  || '|c' || CAST((doc_id + 1) % 7 AS VARCHAR) || '] ' ELSE '' END
        AS page_text
      FROM documents)
"""


def _synth_page_text(k: F.Column) -> F.Column:
    """The Spark twin of _PAGE_TEXT_SQL — all-integer string building so
    both engines emit byte-identical page text."""
    def s(c):
        return c.cast("long").cast("string")

    def dec(v):  # integer-built 'X.Y'
        return F.concat(s(F.floor(v / 10)), F.lit("."), s(v % 10))

    price_v = k % 10000 + 99
    cat = F.element_at(
        F.array(F.lit("Books"), F.lit("Home Goods"), F.lit("Toys")),
        (k % 3).cast("int") + 1,
    )
    def fb(x):
        return F.concat(F.lit("FB["), dec(x % 50), F.lit("|c"), s(x % 7), F.lit("] "))

    return F.concat(
        F.when(k % 5 != 0, F.concat(s(k % 300), F.lit(" answered questions | "))).otherwise(""),
        s(k % 500), F.lit(" customer reviews | "),
        dec(k % 45 + 5), F.lit(" out of 5 stars | "),
        F.when(k % 4 == 0, F.concat(F.lit('Amazons Choice for "tok'), s(k % 100), F.lit('" | '))).otherwise(""),
        F.when(
            k % 6 != 0,
            F.concat(
                F.lit("#"),
                F.when(k % 6 == 2, F.lit("1,234")).otherwise(s(k % 900 + 100)),
                F.lit(" in "), cat, F.lit(" | "),
            ),
        ).otherwise(""),
        F.when(
            k % 2 == 0,
            F.concat(
                F.when(k % 8 == 0, F.lit("sold by amazon.com")).otherwise(F.lit("Sold by Amazon.com")),
                F.lit(" $"), s(F.floor(price_v / 100)), F.lit("."),
                F.lpad(s(price_v % 100), 2, "0"), F.lit(" | "),
            ),
        ).otherwise(""),
        F.when(k % 7 == 0, F.lit("Best Seller in Books | ")).otherwise(""),
        F.when(k % 9 == 0, F.lit("Subscribe & Save: | ")).otherwise(""),
        F.when(k % 10 == 0, F.concat(F.lit("UPC: "), s(k * 7), F.lit(" | "))).otherwise(""),
        F.when(k % 11 == 0, F.concat(F.lit("New ("), s(k % 50 + 1), F.lit(") from | "))).otherwise(""),
        F.when(k % 3 >= 1, fb(k)).otherwise(""),
        F.when(k % 3 == 2, fb(k + 1)).otherwise(""),
    )


@query(
    "extract_product_struct",
    f"""
    WITH {_PAGE_TEXT_SQL}
    SELECT doc_id,
           coalesce(try_cast(regexp_extract(page_text, '(\\d+) answered questions', 1) AS INT), 0) AS answered_questions,
           coalesce(try_cast(regexp_extract(page_text, '(\\d+) customer reviews', 1) AS INT), 0) AS customer_reviews,
           coalesce(try_cast(regexp_extract(page_text, '([0-9.]+) out of 5 stars', 1) AS DOUBLE), 0.0) AS rating,
           nullif(regexp_extract(page_text, 'Choice for "([^"]+)"', 1), '') AS amazon_choice,
           try_cast(replace(regexp_extract(page_text, '#([0-9,]+) in ', 1), ',', '') AS INT) AS rank,
           nullif(regexp_extract(page_text, '#[0-9,]+ in ([A-Za-z ]+?) \\|', 1), '') AS category,
           strpos(lower(page_text), 'sold by amazon.com') > 0 AS is_amazon_selling,
           CASE WHEN strpos(lower(page_text), 'sold by amazon.com') > 0
                THEN try_cast(regexp_extract(page_text, '\\$([0-9.]+)', 1) AS DOUBLE) END AS amazon_price,
           nullif(regexp_extract(page_text, 'Best Seller in ([A-Za-z ]+?) \\|', 1), '') AS best_seller,
           strpos(page_text, 'Subscribe & Save:') > 0 AS subscribe_save,
           nullif(regexp_extract(page_text, 'UPC: (\\d+)', 1), '') AS upcs,
           try_cast(regexp_extract(page_text, 'New \\((\\d+)\\) from', 1) AS INT) AS number_of_sellers,
           CAST(len(regexp_extract_all(page_text, 'FB\\[[^\\]]*\\]')) AS INT) AS n_feedback,
           coalesce(array_to_string(regexp_extract_all(page_text, 'FB\\[[^\\]]*\\]'), ';'), '') AS feedback_summary
    FROM pg
    """,
)
def extract_product_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/X6/X9 parity: the 13-field wide product struct + nested feedback
    array (parser.py:191-431; amazon_merchant.py:470-484), extracted from
    deterministically synthesized page text with NATIVE regexp only.
    Arrays flatten to (count, joined-raw-matches) for the driver's scalar
    hash; the full nested struct is golden-fixture tested in
    tests/test_extract_struct.py."""
    from ..operators.extract import parse_product_struct

    d = _docs(spark, sf_dir).select("doc_id")
    pages = d.withColumn("page_text", _synth_page_text(F.col("doc_id")))
    parsed = parse_product_struct(pages, "page_text")
    fb_raw = F.expr(r"regexp_extract_all(page_text, 'FB\\[[^\\]]*\\]', 0)")
    return parsed.select(
        "doc_id",
        F.col("product.answered_questions").alias("answered_questions"),
        F.col("product.customer_reviews").alias("customer_reviews"),
        F.col("product.rating").alias("rating"),
        F.col("product.amazon_choice").alias("amazon_choice"),
        F.col("product.rank").alias("rank"),
        F.col("product.category").alias("category"),
        F.col("product.is_amazon_selling").alias("is_amazon_selling"),
        F.col("product.amazon_price").alias("amazon_price"),
        F.col("product.best_seller").alias("best_seller"),
        F.col("product.subscribe_save").alias("subscribe_save"),
        F.col("product.upcs").alias("upcs"),
        F.col("product.number_of_sellers").alias("number_of_sellers"),
        F.size(fb_raw).cast("int").alias("n_feedback"),
        F.array_join(fb_raw, ";").alias("feedback_summary"),
    )


# ---------------------------------------------------------------------------
# X7-X10: inventory-page card extraction
# ---------------------------------------------------------------------------

def _inv_card_sql(i: int) -> str:
    """One synthetic product card (SQL side), present when doc_id%4 >= i."""
    p = f"((doc_id * 13 + {i * 7}) % 10000 + 99)"
    return f"""CASE WHEN doc_id % 4 >= {i} THEN 'CARD{{'
      || CASE WHEN (doc_id + {i}) % 2 = 0 THEN 'PRIME ' ELSE '' END
      || 'href=/prod-' || CAST(doc_id AS VARCHAR) || '/dp/B'
      || lpad(CAST(doc_id * 7 + {i} AS VARCHAR), 9, '0') || '/ref=sr_{i}'
      || ' name=item-' || CAST(doc_id AS VARCHAR) || '-{i}'
      || ' PRICE[$' || CAST({p} // 100 AS VARCHAR) || '.'
      || lpad(CAST({p} % 100 AS VARCHAR), 2, '0') || ']'
      || CASE WHEN (doc_id + {i}) % 3 = 0
           THEN ' WAS[$' || CAST(({p} + 500) // 100 AS VARCHAR) || '.'
                || lpad(CAST(({p} + 500) % 100 AS VARCHAR), 2, '0') || ']' ELSE '' END
      || CASE WHEN (doc_id + {i}) % 4 < 3
           THEN ' ' || CAST(((doc_id + {i}) % 41 + 10) // 10 AS VARCHAR) || '.'
                || CAST(((doc_id + {i}) % 41 + 10) % 10 AS VARCHAR) || ' out of 5 stars'
           ELSE '' END
      || ' reviews=' || CAST((doc_id * 3 + {i}) % 5000 AS VARCHAR)
      || CASE WHEN (doc_id + {i}) % 7 = 0 THEN ' Best Seller'
              WHEN (doc_id + {i}) % 7 = 1 THEN ' Amazon Choice' ELSE '' END
      || CASE WHEN (doc_id + {i}) % 5 = 0 THEN ' Save more with Subscribe & Save' ELSE '' END
      || CASE WHEN (doc_id + {i}) % 6 = 0 THEN ' Price may vary by' ELSE '' END
      || CASE WHEN (doc_id + {i}) % 5 IN (1, 2, 3)
           THEN ' cat=cat' || CAST((doc_id + {i}) % 8 AS VARCHAR) ELSE '' END
      || '}} ' ELSE '' END"""


_INV_TEXT_SQL = f"""
    inv AS (
      SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
             THEN '1-16 of over ' || CAST((doc_id % 9000 + 1000) // 1000 AS VARCHAR)
                  || ',' || lpad(CAST((doc_id % 9000 + 1000) % 1000 AS VARCHAR), 3, '0')
                  || ' results | '
             WHEN doc_id % 3 = 1
             THEN '1-16 of ' || CAST(doc_id % 997 AS VARCHAR) || ' results | '
             ELSE CAST(doc_id % 450 + 1 AS VARCHAR) || ' results | ' END
        || CASE WHEN doc_id % 3 >= 1
             THEN 'BRAND(brand' || CAST((doc_id + 1) % 10 AS VARCHAR) || ') ' ELSE '' END
        || CASE WHEN doc_id % 3 >= 2
             THEN 'BRAND(brand' || CAST((doc_id + 2) % 10 AS VARCHAR) || ') ' ELSE '' END
        || {_inv_card_sql(1)}
        || {_inv_card_sql(2)}
        || {_inv_card_sql(3)}
        AS page_text
      FROM documents)
"""


def _synth_inventory_text(k: F.Column) -> F.Column:
    """Spark twin of _INV_TEXT_SQL — all-integer string building."""
    def s(c):
        return c.cast("long").cast("string")

    def card(i: int) -> F.Column:
        di = k + i
        p = (k * 13 + i * 7) % 10000 + 99
        q = p + 500
        st = di % 41 + 10
        body = F.concat(
            F.lit("CARD{"),
            F.when(di % 2 == 0, F.lit("PRIME ")).otherwise(""),
            F.lit("href=/prod-"), s(k), F.lit("/dp/B"),
            F.lpad(s(k * 7 + i), 9, "0"), F.lit(f"/ref=sr_{i}"),
            F.lit(" name=item-"), s(k), F.lit(f"-{i}"),
            F.lit(" PRICE[$"), s(F.floor(p / 100)), F.lit("."),
            F.lpad(s(p % 100), 2, "0"), F.lit("]"),
            F.when(
                di % 3 == 0,
                F.concat(F.lit(" WAS[$"), s(F.floor(q / 100)), F.lit("."),
                         F.lpad(s(q % 100), 2, "0"), F.lit("]")),
            ).otherwise(""),
            F.when(
                di % 4 < 3,
                F.concat(F.lit(" "), s(F.floor(st / 10)), F.lit("."), s(st % 10),
                         F.lit(" out of 5 stars")),
            ).otherwise(""),
            F.lit(" reviews="), s((k * 3 + i) % 5000),
            F.when(di % 7 == 0, F.lit(" Best Seller"))
             .when(di % 7 == 1, F.lit(" Amazon Choice")).otherwise(""),
            F.when(di % 5 == 0, F.lit(" Save more with Subscribe & Save")).otherwise(""),
            F.when(di % 6 == 0, F.lit(" Price may vary by")).otherwise(""),
            F.when((di % 5).isin(1, 2, 3),
                   F.concat(F.lit(" cat=cat"), s(di % 8))).otherwise(""),
            F.lit("} "),
        )
        return F.when(k % 4 >= i, body).otherwise(F.lit(""))

    over_n = k % 9000 + 1000
    bar = (
        F.when(
            k % 3 == 0,
            F.concat(F.lit("1-16 of over "), s(F.floor(over_n / 1000)), F.lit(","),
                     F.lpad(s(over_n % 1000), 3, "0"), F.lit(" results | ")),
        )
        .when(k % 3 == 1, F.concat(F.lit("1-16 of "), s(k % 997), F.lit(" results | ")))
        .otherwise(F.concat(s(k % 450 + 1), F.lit(" results | ")))
    )
    return F.concat(
        bar,
        F.when(k % 3 >= 1, F.concat(F.lit("BRAND(brand"), s((k + 1) % 10), F.lit(") "))).otherwise(""),
        F.when(k % 3 >= 2, F.concat(F.lit("BRAND(brand"), s((k + 2) % 10), F.lit(") "))).otherwise(""),
        card(1), card(2), card(3),
    )


_INV_NULLSAFE = "CASE WHEN card IS NULL THEN NULL ELSE {} END"


@query(
    "extract_inventory_cards",
    f"""
    WITH {_INV_TEXT_SQL.strip()},
    pg AS (
      SELECT doc_id,
             coalesce(try_cast(replace(regexp_extract(page_text, '([0-9][0-9,]*) results', 1), ',', '') AS INT), 0) AS inventory_count,
             coalesce(array_to_string(regexp_extract_all(page_text, 'BRAND\\(([^)]*)\\)', 1), ';'), '') AS brands,
             regexp_extract_all(page_text, 'CARD\\{{([^}}]*)\\}}', 1) AS cards
      FROM inv),
    ex AS (
      SELECT doc_id, inventory_count, brands,
             CAST(len(cards) AS INT) AS n_cards,
             CASE WHEN len(cards) = 0 THEN NULL ELSE CAST(i AS INT) END AS card_idx,
             cards[CAST(i AS INT)] AS card
      FROM pg, LATERAL unnest(generate_series(1, greatest(len(cards), 1))) AS t(i))
    SELECT doc_id, inventory_count, brands, n_cards, card_idx,
           regexp_extract(regexp_extract(card, 'href=([^ ]+)', 1), 'dp/(.+)/', 1) AS asin,
           nullif(regexp_extract(card, 'name=([^ ]+)', 1), '') AS product_name,
           CASE WHEN card IS NULL THEN NULL
                ELSE 'https://www.amazon.com' || regexp_extract(card, 'href=([^ ]+)', 1) END AS product_url,
           nullif(regexp_extract(card, 'PRICE\\[([^\\]]*)\\]', 1), '') AS current_price,
           nullif(regexp_extract(card, 'WAS\\[([^\\]]*)\\]', 1), '') AS original_price,
           coalesce(strpos(card, 'Best Seller') > 0, FALSE) AS best_seller,
           coalesce(strpos(card, 'Amazon Choice') > 0, FALSE) AS amazon_choice,
           nullif(regexp_extract(card, 'reviews=([0-9]+)', 1), '') AS reviews_count,
           try_cast(regexp_extract(card, '([0-9]\\.[0-9]) out of 5 stars', 1) AS DOUBLE) AS review_stars,
           coalesce(strpos(card, 'Save more with Subscribe & Save') > 0, FALSE) AS save_and_subscribe,
           coalesce(strpos(card, 'Price may vary by') > 0, FALSE) AS variation,
           nullif(regexp_extract(card, 'cat=([^ \\]]+)', 1), '') AS category,
           coalesce(strpos(card, 'PRIME') > 0, FALSE) AS fba,
           coalesce(NOT (strpos(card, 'PRIME') > 0), FALSE) AS fbm,
           {_INV_NULLSAFE.format("'ATVPDKIKX0DER'")} AS marketplace_id,
           {_INV_NULLSAFE.format("'job-0'")} AS jobid,
           {_INV_NULLSAFE.format("n_cards")} AS total_expected_len
    FROM ex
    """,
)
def extract_inventory_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7-X10 parity: inventory-page card splitter + result-bar count +
    brand refinements + the 20-field per-card product struct
    (amazon_merchant.py:186-256; amazon_merchant_inventory.py:64-191),
    extracted with NATIVE regexp over deterministically synthesized page
    text. posexplode_outer keeps card-less pages (count/brands still
    asserted) with null card fields, mirroring the oracle's padded
    lateral unnest."""
    from ..operators.extract import parse_inventory

    d = _docs_spread(spark, sf_dir).select("doc_id")
    pages = d.withColumn("page_text", _synth_inventory_text(F.col("doc_id")))
    inv = parse_inventory(pages, "page_text", jobid="job-0")
    ex = inv.select(
        "doc_id",
        "inventory_count",
        F.array_join("brands", ";").alias("brands"),
        F.size("products").cast("int").alias("n_cards"),
        F.posexplode_outer("products").alias("pos", "p"),
    )
    return ex.select(
        "doc_id",
        "inventory_count",
        "brands",
        "n_cards",
        (F.col("pos") + 1).cast("int").alias("card_idx"),
        F.col("p.asin").alias("asin"),
        F.col("p.product_name").alias("product_name"),
        F.col("p.product_url").alias("product_url"),
        F.col("p.current_price").alias("current_price"),
        F.col("p.original_price").alias("original_price"),
        F.coalesce(F.col("p.best_seller"), F.lit(False)).alias("best_seller"),
        F.coalesce(F.col("p.amazon_choice"), F.lit(False)).alias("amazon_choice"),
        F.col("p.reviews_count").alias("reviews_count"),
        F.col("p.review_stars").alias("review_stars"),
        F.coalesce(F.col("p.save_and_subscribe"), F.lit(False)).alias("save_and_subscribe"),
        F.coalesce(F.col("p.variation"), F.lit(False)).alias("variation"),
        F.col("p.category").alias("category"),
        F.coalesce(F.col("p.fba"), F.lit(False)).alias("fba"),
        F.coalesce(F.col("p.fbm"), F.lit(False)).alias("fbm"),
        F.col("p.marketplace_id").alias("marketplace_id"),
        F.col("p.jobid").alias("jobid"),
        F.col("p.total_expected_len").alias("total_expected_len"),
    )
