"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride opaque ``binary`` columns with typed metadata extracted
by Arrow-batched ``mapInPandas`` stages. The Spark-side plumbing — schema,
batching, partition behavior — is real and tested; the actual codec work is
stubbed: this container has no image/audio libraries, so ``decode_image``
raises ``NotImplementedError`` unless a decoder is importable, and the
metadata stage uses a deterministic digest-derived fake in its place
(cross-engine reproducible, so correctness gates still apply end-to-end).

At scale: blobs live in their own column family / Parquet column so scans
that don't touch pixels never read them (column pruning); metadata stages
repartition by a content-digest prefix for uniform task sizing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "id long, n_bytes int, width int, height int, digest string"


def decode_image(blob: bytes):
    """Real decode — gated on an importable decoder (none in-container)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(blob))
    except ImportError as e:  # pragma: no cover - no PIL in this container
        raise NotImplementedError(
            "image decoding requires PIL/pillow; metadata stages use the "
            "deterministic digest-derived fake instead"
        ) from e


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions: digest-derived."""
    return (
        int(digest_hex[:4], 16) % 1024 + 16,
        int(digest_hex[4:8], 16) % 1024 + 16,
    )


def image_meta_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """(id, blob) → (id, n_bytes, width, height, digest)."""
    for pdf in batches:
        if pdf.empty:
            continue
        blobs = pdf["blob"].map(lambda b: bytes(b) if b is not None else b"")
        digests = blobs.map(lambda b: hashlib.md5(b).hexdigest())
        dims = digests.map(_fake_dims)
        yield pd.DataFrame(
            {
                "id": pdf["id"].astype("int64"),
                "n_bytes": blobs.map(len).astype("int32"),
                "width": dims.map(lambda wh: wh[0]).astype("int32"),
                "height": dims.map(lambda wh: wh[1]).astype("int32"),
                "digest": digests,
            }
        )


def extract_image_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Typed metadata for a binary column via an Arrow-batched stage."""
    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("long").alias("id"), F.col(blob_col).alias("blob")
    ).mapInPandas(image_meta_stage, IMAGE_META_SCHEMA)
