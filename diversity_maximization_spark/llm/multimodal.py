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


TARGET_W, TARGET_H = 32, 32


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize: deterministic re-hash standing in for the resized
    pixel buffer (a real backend returns the actual w*h buffer)."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image resize not wired yet")
    return hashlib.md5(payload + f"{w}x{h}".encode()).digest()


@query("multimodal_resize")  # rows-only: stub codec, real plumbing
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image rows -> fixed-size thumbnails: filter to one modality
    (pushed to the scan), Arrow-batched per-partition transform, typed
    output schema carrying the new geometry."""
    d = load(spark, sf_dir, "documents")
    media = with_fake_media(d).filter(F.col("media_type") == "image/png")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": TARGET_W,
                    "height": TARGET_H,
                    "thumb": [
                        _resize_stub(p, TARGET_W, TARGET_H) for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(
        gen, "doc_id bigint, width int, height int, thumb binary"
    )


FEAT_DIM = 8


@query("multimodal_features")  # rows-only: stub codec, real plumbing
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction: media bytes -> fixed-dim float vector
    (deterministic hash-derived stub; a real model would run in the
    same Arrow batch shape). Output is join-ready with `embeddings`."""
    d = load(spark, sf_dir, "documents")
    media = with_fake_media(d)

    def gen(batches):
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                h = hashlib.sha256(p).digest()
                feats.append(
                    [round(b / 255.0, 6) for b in h[:FEAT_DIM]]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return media.mapInPandas(gen, "doc_id bigint, feature array<double>")


N_FRAMES = 4


@query("multimodal_frame_sample")  # rows-only: stub codec, real plumbing
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video rows -> N sampled frames each (1->N mapInPandas): every
    output row carries (doc_id, frame_idx, frame payload stub). The
    fan-out happens executor-side in the same task as the decode —
    no shuffle between decode and sampling."""
    d = load(spark, sf_dir, "documents")
    media = with_fake_media(d).filter(F.col("media_type") == "video/mp4")

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(N_FRAMES):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(hashlib.md5(p + bytes([i])).digest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.mapInPandas(
        gen, "doc_id bigint, frame_idx int, frame binary"
    )
