"""F25 opaque id tokens (JWT HS256 + AES-GCM) — native expressions
verified against Python's stdlib hmac/base64 as the independent oracle,
plus roundtrip / tamper / expiry / wrong-key contracts.

Reference semantics: api/app/crypt.py:9-47 (Crypt/CryptID),
api/app/main.py:614,629 (mint on list rows, decrypt+expiry on /seller).
"""

from __future__ import annotations

import base64
import hashlib
import hmac as pyhmac
import json

import pytest

from pyspark.sql import functions as F

from scrapy_cluster_test_spark.functions import idcrypt

SECRET = b"0123456789abcdef0123456789abcdef"  # 32 bytes, AES-256


def _b64url(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).decode("ascii").rstrip("=")


def _jwt_py(payload_json: str, secret: bytes) -> str:
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}, separators=(",", ":")).encode())
    signing = header + "." + _b64url(payload_json.encode("utf8"))
    sig = _b64url(pyhmac.new(secret, signing.encode("ascii"), hashlib.sha256).digest())
    return signing + "." + sig


@pytest.fixture(scope="module")
def msgs(spark):
    rows = [
        ("", ),
        ("a", ),
        ("5f2b8c9d1e0a7b6c5d4e3f2a", ),  # Mongo-ObjectId-shaped
        ("héllo wörld ünïcode ✓", ),
        ("x" * 500, ),  # forces multi-line MIME bugs to surface if any
    ]
    return spark.createDataFrame(rows, "msg string")


def test_hmac_sha256_matches_stdlib(msgs):
    got = msgs.select(
        "msg", F.hex(idcrypt.hmac_sha256(SECRET, F.col("msg"))).alias("h")
    ).collect()
    for r in got:
        want = pyhmac.new(SECRET, r["msg"].encode("utf8"), hashlib.sha256).hexdigest()
        assert r["h"].lower() == want, r["msg"]


def test_hmac_long_key_is_prehashed(msgs):
    long_key = b"k" * 100  # > SHA-256 block size: RFC 2104 hashes it first
    got = msgs.select(F.hex(idcrypt.hmac_sha256(long_key, F.col("msg"))).alias("h"), "msg").collect()
    for r in got:
        want = pyhmac.new(long_key, r["msg"].encode("utf8"), hashlib.sha256).hexdigest()
        assert r["h"].lower() == want


def test_b64url_roundtrip_matches_stdlib(msgs):
    got = msgs.select(
        "msg",
        idcrypt.b64url_encode(F.col("msg")).alias("enc"),
        idcrypt.b64url_decode(idcrypt.b64url_encode(F.col("msg"))).cast("string").alias("back"),
    ).collect()
    for r in got:
        assert r["enc"] == _b64url(r["msg"].encode("utf8"))
        assert r["back"] == r["msg"]


def test_jwt_encode_matches_pure_python_and_verifies(msgs, spark):
    payloads = msgs.select(
        F.to_json(F.struct(F.col("msg").alias("_id"), F.lit(1700000000).alias("exp"))).alias("p")
    )
    got = payloads.select(
        "p",
        idcrypt.jwt_encode_hs256(F.col("p"), SECRET).alias("tok"),
    ).collect()
    for r in got:
        assert r["tok"] == _jwt_py(r["p"], SECRET)

    toks = spark.createDataFrame([(r["tok"],) for r in got], "tok string")
    dec = toks.select(idcrypt.jwt_decode_hs256(F.col("tok"), SECRET).alias("d")).collect()
    assert all(r["d"]["valid"] for r in dec)
    # tampered payload (flip one base64url char) → invalid
    bad = spark.createDataFrame(
        [(t["tok"][:41] + ("A" if t["tok"][41] != "A" else "B") + t["tok"][42:],) for t in got],
        "tok string",
    )
    decb = bad.select(idcrypt.jwt_decode_hs256(F.col("tok"), SECRET).alias("d")).collect()
    assert not any(r["d"]["valid"] for r in decb)


def test_encrypt_decrypt_id_roundtrip_and_contracts(spark):
    now = 1_700_000_000
    ids = spark.createDataFrame(
        [(f"id-{i:04d}",) for i in range(64)], "id string"
    ).repartition(7)
    toks = ids.select(
        "id", idcrypt.encrypt_id(F.col("id"), SECRET, F.lit(now)).alias("tok")
    )
    # roundtrip at mint time
    back = toks.select(
        "id", "tok", idcrypt.decrypt_id(F.col("tok"), SECRET, F.lit(now)).alias("d")
    ).collect()
    assert all(r["d"]["valid"] and r["d"]["id"] == r["id"] for r in back)
    # deterministic under partitioning: re-mint at different parallelism
    toks2 = dict(
        ids.repartition(1)
        .select("id", idcrypt.encrypt_id(F.col("id"), SECRET, F.lit(now)).alias("tok"))
        .collect()
    )
    assert {r["id"]: r["tok"] for r in back} == toks2
    # within leeway → valid; past leeway → invalid (reference: 600 s)
    edge = toks.select(
        idcrypt.decrypt_id(F.col("tok"), SECRET, F.lit(now + idcrypt.LEEWAY_SECONDS)).alias("ok"),
        idcrypt.decrypt_id(F.col("tok"), SECRET, F.lit(now + idcrypt.LEEWAY_SECONDS + 1)).alias("old"),
    ).collect()
    assert all(r["ok"]["valid"] for r in edge)
    assert not any(r["old"]["valid"] for r in edge)
    # wrong key → GCM auth fails closed (valid=false, id null), no error
    wrong = toks.select(
        idcrypt.decrypt_id(F.col("tok"), b"f" * 32, F.lit(now)).alias("d")
    ).collect()
    assert all((not r["d"]["valid"]) and r["d"]["id"] is None for r in wrong)
    # garbage token → invalid, no error
    junk = spark.createDataFrame([("zm9v",), ("!!!!",), ("",)], "tok string")
    dj = junk.select(idcrypt.decrypt_id(F.col("tok"), SECRET, F.lit(now)).alias("d")).collect()
    assert not any(r["d"]["valid"] for r in dj)


def test_idcrypt_stays_native(spark):
    """No Python UDF / BatchEvalPython anywhere in the token plan."""
    df = spark.range(4).select(
        idcrypt.decrypt_id(
            idcrypt.encrypt_id(F.col("id").cast("string"), SECRET, F.lit(1)),
            SECRET,
            F.lit(1),
        ).alias("d")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_api_opaque_id_endpoints_roundtrip(spark):
    """List rows mint url-quoted tokens; the detail path resolves one
    back — the reference's /seller-database → /seller id flow."""
    from scrapy_cluster_test_spark.operators import query_api

    now = 1_700_000_000
    df = spark.createDataFrame(
        [("5f2b8c9d1e0a7b6c5d4e3f2a", "NY"), ("0123456789abcdef01234567", "CA")],
        "id string, state string",
    )
    listed = query_api.with_opaque_id(df, "id", SECRET, now).collect()
    assert all(r["id"] not in ("5f2b8c9d1e0a7b6c5d4e3f2a", "0123456789abcdef01234567") for r in listed)
    got = {
        query_api.resolve_opaque_id(spark, r["id"], SECRET, now): r["state"]
        for r in listed
    }
    assert got == {"5f2b8c9d1e0a7b6c5d4e3f2a": "NY", "0123456789abcdef01234567": "CA"}
    # expired / tampered tokens surface as the API's 400, not a crash
    with pytest.raises(query_api.QueryError):
        query_api.resolve_opaque_id(
            spark, listed[0]["id"], SECRET, now + idcrypt.LEEWAY_SECONDS + 1
        )
    with pytest.raises(query_api.QueryError):
        query_api.resolve_opaque_id(spark, "not-a-token", SECRET, now)
