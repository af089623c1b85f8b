"""Broadcast dimension lookups with the reference's OR-match semantics.

Reference: amazon_merchant.py:493-506 — US state normalization walks the
us_states list and takes the FIRST entry whose 2-letter code equals the
cleaned input (uppercased) OR whose full name equals it; unmatched input
passes through, and non-US rows are never touched.

Spark-first form (SURVEY J2): two broadcast LEFT joins (one per match
rule) + a coalesce that encodes the rule precedence. No state-list loop,
no UDF — the whole resolution is one projection over two broadcast hash
joins, so at 10^10 rows it costs two map-side probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_state(
    rows: DataFrame,
    us_states: DataFrame,
    state_col: str = "state_raw",
    country_col: str = "country",
    out_col: str = "state_code",
) -> DataFrame:
    """Resolve free-form state strings to canonical 2-letter codes.

    ``us_states``: (code string, state_name string). Match precedence —
    exactly the reference's loop order:

    1. cleaned input is 2 chars and equals a code (case-insensitive);
    2. cleaned input equals a full state name (case-insensitive);
    3. otherwise the cleaned input passes through;
    and rows whose ``country_col`` != 'US' keep the raw value untouched.

    "cleaned" = dots stripped + uppercased (the reference's
    ``replace('.','').title()`` — case-folded here since matching is
    case-insensitive either way).
    """
    cleaned = F.upper(F.regexp_replace(F.col(state_col), r"\.", ""))
    r = rows.withColumn("_st", cleaned)
    by_code = F.broadcast(us_states.select(F.col("code").alias("_code_c")))
    by_name = F.broadcast(
        us_states.select(
            F.upper(F.col("state_name")).alias("_st_name"),
            F.col("code").alias("_code_n"),
        )
    )
    r = r.join(
        by_code,
        (F.length("_st") == 2) & (F.col("_st") == F.col("_code_c")),
        "left",
    ).join(by_name, F.col("_st") == F.col("_st_name"), "left")
    resolved = F.when(F.col(country_col) != "US", F.col(state_col)).otherwise(
        F.coalesce(F.col("_code_c"), F.col("_code_n"), F.col("_st"))
    )
    return r.withColumn(out_col, resolved).drop("_st", "_code_c", "_st_name", "_code_n")
