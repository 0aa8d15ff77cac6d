"""Multimodal column plumbing (SURVEY.md §2.2-L; prompt mandate).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, partition-preserving mapInPandas,
Arrow batch shapes, deterministic outputs — is real and tested; the
actual codec decode is STUBBED (this container has no image/audio
libraries): `_decode_stub` derives deterministic fake features from
the bytes and raises NotImplementedError if a real codec is
requested. Swapping in PIL/torchaudio later only changes the body of
`_decode_stub`, nothing in the plan.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load

REAL_CODECS_AVAILABLE = False


def _decode_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode: deterministic fake (width, height, mean_luma)
    derived from the payload hash. Replace with a real codec when the
    environment provides one."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image decode not wired yet")
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def _decode_batches(batches):
    for pdf in batches:
        feats = [_decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
            }
        )


def with_fake_media(d: DataFrame) -> DataFrame:
    """Attach a deterministic opaque binary column + metadata (stands
    in for real image bytes; unhex(md5) is stable across runs)."""
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.unhex(F.md5(F.col("text"))).alias("payload"),
    )


@query("multimodal_decode")  # rows-only: decode is a stub, schema is real
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column -> decoded feature columns via Arrow-batched
    mapInPandas (the real 100 TB pattern: decode runs next to the
    data, one pass, no driver involvement)."""
    d = load(spark, sf_dir, "documents")
    media = with_fake_media(d)
    return media.mapInPandas(
        _decode_batches,
        "doc_id bigint, media_type string, n_bytes int, width int, height int, "
        "mean_luma double",
    )
