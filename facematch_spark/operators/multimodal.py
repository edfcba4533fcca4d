"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS — ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested — but the Spark-side plumbing is real
and tested: schemas, Arrow batch shapes, ``mapInPandas`` signatures,
partition-preserving metadata extraction, and frame-sampling row explosion.

Contract: a production deployment swaps ``_fake_decode`` for Pillow/ffmpeg
calls without touching any plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image | audio | video
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("magic", T.StringType(), True),       # sniffed container type
        T.StructField("status", T.StringType(), False),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType(), False), True),
        T.StructField("status", T.StringType(), False),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"OggS": "ogg",
    b"\x1aE\xdf\xa3": "webm",
}


def _sniff(b: bytes) -> str | None:
    for sig, name in _MAGIC.items():
        if b.startswith(sig):
            return name
    return None


def extract_metadata(media: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(media_id, kind, blob) → MEDIA_META. Partition-preserving (no
    shuffle); one Arrow batch in, one out. The blob itself never leaves the
    executor — only bounded metadata does (the 100 TB rule: signatures move,
    payloads don't)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[blob_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": blobs.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": blobs.map(lambda b: hashlib.sha256(b or b"").hexdigest()),
                    "magic": blobs.map(lambda b: _sniff(b or b"")),
                    "status": blobs.map(lambda b: "ok" if b else "empty"),
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_META)


def _fake_decode(blob: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake feature extractor: a seeded projection of the
    blob's digest — stands in for a real decode+embed so plumbing tests are
    meaningful (same blob ⇒ same feature)."""
    digest = hashlib.sha256(blob).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


def decode_image(blob: bytes) -> np.ndarray:
    """Real decode path — requires an image library absent from this
    container. STUB per driver brief."""
    raise NotImplementedError(
        "image decode requires Pillow/opencv (not in this container); "
        "use feature_extract(..., fake=True) for plumbing tests"
    )


def feature_extract(
    media: DataFrame, out_dim: int = 16, fake: bool = True, blob_col: str = "blob"
) -> DataFrame:
    """(media_id, blob) → fixed-dim feature vectors via Arrow batches.
    ``fake=False`` routes to the real decoder (NotImplementedError here)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            status = []
            for b in pdf[blob_col]:
                if not b:
                    feats.append(None)
                    status.append("empty")
                    continue
                if fake:
                    feats.append(_fake_decode(b, out_dim).tolist())
                    status.append("ok")
                else:
                    feats.append(None)
                    status.append("decode_unavailable")
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats, "status": status})

    return media.mapInPandas(batches, schema=FEATURES)


def sample_frames(video: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: explode one video blob row into ≤max_frames
    "frame" rows (here: fixed-stride byte windows standing in for decoded
    frames). Output (media_id, frame_idx, frame_blob) — the row-explosion
    shape a real ffmpeg-backed sampler produces."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                if not b:
                    continue
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(b[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int32"),
                                "frame_blob": pd.Series(frames, dtype=object)})

    return video.mapInPandas(batches, schema="media_id long, frame_idx int, frame_blob binary")


def make_media_df(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Synthesize a media table from the documents table (text → utf-8 blob)
    — deterministic stand-in input for the plumbing tests/queries."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("blob"),
    )
