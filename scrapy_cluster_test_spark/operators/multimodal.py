"""Multimodal payload operators: decode / verify / feature-extract over
opaque binary image columns.

The Spark-side plumbing is real and tested — schema, Arrow batching,
partitioning; the codecs are the container-safe ones from
functions/imagecodec.py (pure-zlib PNG + the documented lossy stand-in).
On a cluster image with PIL/ffmpeg, only the inner decode call changes.

Reference parallel: the reference parses HTML payloads per response
(SURVEY §2.10); here the payload is image+caption per the graft input_hint,
with the per-row invariant: decoded pixels PSNR≥40dB vs source, captions
byte-equal (BASELINE.json:15).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..datagen import _row_rng, _SIZES
from ..functions.imagecodec import decode_image, phash64, psnr

# Arrow records/batch for binary-payload stages. The session default
# (10k, fine for scalar columns) turns into ~200 MB Arrow batches when a
# row carries image bytes — k python workers each holding one in flight
# at local[k] blew resident sets up and serialized the socket writes
# (measured: the r1 8→32-core decode INVERSION, 45.5 s → 122.2 s; with
# 512 the same phase reads 14.6 s → 8.7 s — BENCH/BASELINE.md, decode
# knee section).
BINARY_ARROW_RECORDS_PER_BATCH = 512


def configure_arrow_for_binary(spark, records_per_batch: int | None = None) -> None:
    """Bound Arrow batch ROW counts before running the binary-column
    operators below. Session-level because maxRecordsPerBatch is the only
    batch-size dial Spark exposes to Python UDF transfer; call once per
    binary pipeline (idempotent), or set SCT_ARROW_BATCH to override."""
    import os

    n = records_per_batch or int(
        os.environ.get("SCT_ARROW_BATCH", BINARY_ARROW_RECORDS_PER_BATCH)
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(n))


VERIFY_SCHEMA = (
    "image_id string, fmt string, psnr_db double, caption_ok boolean, "
    "shape_ok boolean, phash_rehash long"
)


def _verify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            i = int(r.image_id[3:])
            rng = _row_rng(i)
            w = _SIZES[i % 3]
            h = _SIZES[(i // 3) % 3]
            src = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            dec = decode_image(r.bytes)
            toks = rng.integers(0, 1000, 5 + i % 8)
            expect_caption = f"caption {i}: " + " ".join(f"tok{t}" for t in toks)
            out.append(
                {
                    "image_id": r.image_id,
                    "fmt": r.fmt,
                    "psnr_db": min(psnr(src, dec), 1e9),
                    "caption_ok": r.caption == expect_caption,
                    "shape_ok": dec.shape == (h, w, 3),
                    "phash_rehash": phash64(src),
                }
            )
        yield pd.DataFrame(out)


def verify_payloads(images: DataFrame) -> DataFrame:
    """Per-row invariant check, distributed: PSNR vs the regenerated
    source, caption byte-equality, shape, and phash recomputation.
    Arrow-batched; the per-image decode work is the payload itself, not
    row-at-a-time overhead."""
    return images.select("image_id", "bytes", "fmt", "caption").mapInPandas(
        _verify_batches, schema=VERIFY_SCHEMA
    )


FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "luma_p50 double, contrast double"
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            px = decode_image(r.bytes).astype(np.float64)
            luma = px @ np.array([0.299, 0.587, 0.114])
            out.append(
                {
                    "image_id": r.image_id,
                    "mean_r": float(px[..., 0].mean()),
                    "mean_g": float(px[..., 1].mean()),
                    "mean_b": float(px[..., 2].mean()),
                    "luma_p50": float(np.median(luma)),
                    "contrast": float(luma.std()),
                }
            )
        yield pd.DataFrame(out)


def extract_features(images: DataFrame) -> DataFrame:
    """Image feature extraction (decode → channel stats) as an Arrow-batched
    mapInPandas — the pattern a real embedding/resize stage would use."""
    return images.select("image_id", "bytes").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def frame_sample_stub(video_bytes: bytes, every_n: int = 30):
    """Video frame sampling requires a real decoder (ffmpeg/pyav), which is
    not available in this container. The Spark-side shape would be
    identical to extract_features: binary column → mapInPandas →
    one row per sampled frame."""
    raise NotImplementedError(
        "video decode unavailable in this container; plug pyav here"
    )
