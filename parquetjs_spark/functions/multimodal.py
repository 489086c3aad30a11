"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a metadata struct;
decode / feature-extraction run as Arrow-batched ``mapInPandas`` stages.
The actual media decode is STUBBED (no image/audio libs in this
container — clearly marked below); everything Spark-side — schema,
batching, partitioning, UDF signatures — is real and tested.

At scale: payloads dominate partition size, so re-chunk by bytes
(``maxPartitionBytes``) not rows; metadata extraction is a narrow map.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha_prefix", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (deterministic stand-in for image bytes)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata per payload — real plumbing, no media decode needed."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "sha_prefix": [
                        hashlib.sha256(p).hexdigest()[:16] for p in payloads
                    ],
                }
            )

    return media.mapInPandas(fn, schema=MEDIA_META_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real image decode requires PIL/libjpeg, absent from this
    container.  The Spark-side contract (binary in, HxWxC array out)
    is what the pipeline tests exercise via `fake_features`."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use fake_features() for pipeline testing"
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage: binary in -> resized binary + dims out, Arrow-
    batched.  The pixel work is a deterministic stand-in (strided byte
    subsample — no imaging lib in this container, same stub policy as
    decode_image); schema, batching and UDF signature are exactly what
    a PIL/libvips-backed resize would use, so swapping the kernel is a
    one-function change."""
    target = width * height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) >= target:
                    stride = len(b) // target
                    arr = np.frombuffer(b, dtype=np.uint8)[: stride * target]
                    outs.append(arr[::stride][:target].tobytes())
                else:
                    outs.append(b.ljust(target, b"\x00"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(fn, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 256
) -> DataFrame:
    """Frame-sampling stage: one video payload row -> n_frames rows
    (uniform temporal stride), the fan-out shape a real decoder UDF
    has.  Frame extraction is the deterministic byte-slice stand-in
    (no codec libs here); at scale the fan-out is a narrow map with no
    shuffle — downstream per-frame features stay embarrassingly
    parallel."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    lo = i * step
                    frames.append(b[lo : lo + frame_bytes].ljust(frame_bytes, b"\x00"))
                    ids.append(doc_id)
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "frame": frames,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(fn, schema=FRAME_SCHEMA)


def fake_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic stand-in feature extractor: fixed-dim float vector
    derived from payload bytes (sha256-seeded) — exercises the exact
    batch shape / signature a real encoder UDF would have."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(bytes(p)).digest()
                arr = np.frombuffer(digest[: dim * 4], dtype="<u4").astype(np.float32)
                feats.append((arr / np.float32(2**32)).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.select("doc_id", "payload").mapInPandas(fn, schema=FEATURE_SCHEMA)
