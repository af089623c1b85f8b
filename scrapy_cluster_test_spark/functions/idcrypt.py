"""Opaque row-id tokens: JWT(HS256) + AES — SURVEY §2.9 F25.

Reference parity: the API layer hides storage ids behind reversible
tokens — ``CryptID.encryt`` JWT-encodes ``{"_id": id, "exp": now}`` with
HS256 and AES-encrypts the JWT (api/app/crypt.py:9-47); ``/seller``
decrypts the token back to the id and rejects expired signatures with a
600 s leeway (api/app/main.py:614,629). This module re-expresses both
halves as NATIVE column expressions — no Python UDF — so minting or
validating tokens for a billion API rows is one whole-stage-codegen
projection:

* HMAC-SHA256 via the ipad/opad construction over ``sha2``/``unhex``:
  the secret is a driver-side scalar, so the two padded key blocks are
  Python-computed ``lit`` binaries and each row costs two SHA256s —
  exactly the HMAC definition (RFC 2104).
* JWT HS256 compact serialization (base64url header.payload.signature)
  from ``base64``/``translate``; decode recomputes the signature and
  compares, so tampered tokens surface as ``valid=false``.
* AES-GCM over the JWT via Spark's builtin ``aes_encrypt``/
  ``aes_decrypt`` (SQL-standard, JVM-side). The reference uses CFB with
  a random IV; GCM is the authenticated-mode equivalent Spark ships.
  The IV is derived per-row from ``xxhash64(jwt)`` so outputs are
  DETERMINISTIC — the engine's partitioning-independence contract —
  trading the reference's random-IV semantics for reproducibility
  (pass ``deterministic_iv=False`` to restore random IVs).

Expiry is checked against a caller-supplied ``now`` timestamp (never
wall clock inside the plan), with the reference's 600 s leeway.
"""

from __future__ import annotations

import base64
import json

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK = 64  # SHA-256 HMAC block size (bytes)
_JWT_HEADER = {"alg": "HS256", "typ": "JWT"}
LEEWAY_SECONDS = 600  # api/app/crypt.py:37 self.expiration


def _hmac_key_blocks(secret: bytes) -> tuple[bytes, bytes]:
    """RFC 2104 inner/outer padded key blocks for a scalar secret."""
    import hashlib

    if len(secret) > _BLOCK:
        secret = hashlib.sha256(secret).digest()
    key = secret.ljust(_BLOCK, b"\x00")
    return (
        bytes(b ^ 0x36 for b in key),
        bytes(b ^ 0x5C for b in key),
    )


def hmac_sha256(secret: bytes, msg: Column) -> Column:
    """HMAC-SHA256 of a binary/string column under a scalar secret.

    Two native sha2 passes (ipad block ∥ msg, then opad block ∥ inner
    digest); returns 32 raw bytes (binary).
    """
    ipad, opad = _hmac_key_blocks(secret)
    inner = F.unhex(F.sha2(F.concat(F.lit(ipad), msg.cast("binary")), 256))
    return F.unhex(F.sha2(F.concat(F.lit(opad), inner), 256))


def _b64_clean(col: Column) -> Column:
    """Spark's ``base64`` MIME-chunks at 76 chars with CRLF; translate
    with empty replacements DELETES the extra from-chars natively."""
    return F.translate(F.base64(col.cast("binary")), "\r\n", "")


def b64url_encode(col: Column) -> Column:
    """base64url (RFC 7515: +/ → -_ and padding stripped) of binary."""
    return F.regexp_replace(
        F.translate(_b64_clean(col), "+/", "-_"), "=+$", ""
    )


def b64url_decode(col: Column) -> Column:
    """Inverse of b64url_encode → binary (padding restored natively)."""
    std = F.translate(col, "-_", "+/")
    pad = F.pmod(-F.length(std), F.lit(4))
    return F.unbase64(F.concat(std, F.lit("===").substr(F.lit(1), pad)))


def _b64url_py(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).decode("ascii").rstrip("=")


def jwt_encode_hs256(payload_json: Column, secret: bytes) -> Column:
    """HS256 compact JWT of a JSON-string column (header is constant)."""
    header = _b64url_py(
        json.dumps(_JWT_HEADER, separators=(",", ":")).encode("utf8")
    )
    signing_input = F.concat(
        F.lit(header + "."), b64url_encode(payload_json)
    )
    sig = b64url_encode(hmac_sha256(secret, signing_input))
    return F.concat(signing_input, F.lit("."), sig)


def jwt_decode_hs256(token: Column, secret: bytes) -> Column:
    """struct(payload_json string, valid boolean) — valid iff the
    recomputed HS256 signature matches the token's third segment."""
    parts = F.split(token, r"\.")
    signing_input = F.concat(
        parts.getItem(0), F.lit("."), parts.getItem(1)
    )
    expect = b64url_encode(hmac_sha256(secret, signing_input))
    return F.struct(
        b64url_decode(parts.getItem(1)).cast("string").alias("payload_json"),
        (
            (F.size(parts) == 3) & (parts.getItem(2) == expect)
        ).alias("valid"),
    )


def _aes_key(secret: bytes) -> bytes:
    """Normalize an arbitrary secret to a 32-byte AES-256 key (the
    reference requires the caller to supply exactly 32 bytes; hashing
    keeps that contract without failing on other lengths)."""
    import hashlib

    return secret if len(secret) in (16, 24, 32) else hashlib.sha256(secret).digest()


def encrypt_id(
    id_col: Column,
    secret: bytes,
    now_ts: Column,
    deterministic_iv: bool = True,
) -> Column:
    """Opaque token for a row id: base64(AES-GCM(JWT({_id, exp}))).

    ``now_ts`` is a caller-supplied epoch-seconds column (the mint
    time); the reference stamps ``exp`` with utcnow and checks it with
    leeway on decrypt (api/app/crypt.py:40,46).
    """
    payload = F.to_json(
        F.struct(
            id_col.cast("string").alias("_id"),
            now_ts.cast("long").alias("exp"),
        )
    )
    token = jwt_encode_hs256(payload, secret)
    key = F.lit(_aes_key(secret))
    if deterministic_iv:
        # 12-byte GCM IV derived from the plaintext: unique per distinct
        # (id, exp) and reproducible under any partitioning. hex(long)
        # drops leading zeros, so lpad to the full 8-byte width first.
        h1 = F.unhex(F.lpad(F.hex(F.xxhash64(token)), 16, "0"))
        h2 = F.unhex(F.lpad(F.hex(F.xxhash64(token, F.lit(1))), 16, "0"))
        iv = F.concat(h1, h2).substr(F.lit(1), F.lit(12))
        enc = F.aes_encrypt(
            token.cast("binary"), key, F.lit("GCM"), F.lit("DEFAULT"), iv
        )
    else:
        enc = F.aes_encrypt(token.cast("binary"), key, F.lit("GCM"))
    return _b64_clean(enc)


def decrypt_id(
    token_col: Column,
    secret: bytes,
    now_ts: Column,
    leeway: int = LEEWAY_SECONDS,
) -> Column:
    """struct(id string, valid boolean) — inverse of encrypt_id.

    ``valid`` requires: AES-GCM auth-tag ok (try_aes_decrypt non-null),
    JWT signature ok, and ``now_ts <= exp + leeway`` (the reference's
    ExpiredSignatureError path, main.py:629-631).
    """
    key = F.lit(_aes_key(secret))
    jwt_str = F.try_aes_decrypt(
        F.unbase64(token_col), key, F.lit("GCM")
    ).cast("string")
    decoded = jwt_decode_hs256(jwt_str, secret)
    fields = F.from_json(
        decoded.getField("payload_json"), "_id STRING, exp LONG"
    )
    not_expired = now_ts.cast("long") <= fields.getField("exp") + F.lit(
        int(leeway)
    )
    valid = (
        jwt_str.isNotNull()
        & decoded.getField("valid")
        & fields.getField("_id").isNotNull()
        & not_expired
    )
    return F.struct(
        F.when(valid, fields.getField("_id")).alias("id"),
        F.coalesce(valid, F.lit(False)).alias("valid"),
    )
