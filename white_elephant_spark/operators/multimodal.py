"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns processed by
Arrow-batched ``mapInPandas`` stages — the pattern a 100 TB multimodal
corpus needs (decode/resize/frame-sample near the data, schema-stable
outputs, no row-at-a-time Python).

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
environment, so the decode kernel is stubbed: ``decode_stub`` produces
deterministic pseudo-metadata from the bytes and raises
``NotImplementedError`` when a real codec is requested. The Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_stub(payload: bytes, codec: str = "fake") -> dict[str, Any]:
    """Deterministic stand-in for an image decode.

    A real deployment swaps this for PIL/torchvision; everything else
    in the operator (batching, schema, partitioning) stays identical.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} needs an image library not present in this environment"
        )
    n = len(payload)
    return {
        "byte_len": n,
        "digest": hashlib.md5(payload).hexdigest(),
        "fake_width": 1 + n % 64,
        "fake_height": 1 + n % 48,
    }


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", codec: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    ``mapInPandas`` keeps the Python boundary at batch granularity
    (one Arrow record batch per call), the only viable shape for
    binary decode at scale — never a row-at-a-time UDF.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(b, codec) for b in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter for the test corpus: UTF-8 bytes of ``text`` stand in
    for an image payload column."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: truncates/pads the
    payload to width*height bytes. A real deployment decodes, resizes
    (PIL/torchvision), re-encodes — same signature, same schema."""
    want = width * height
    return payload[:want].ljust(want, b"\0")


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch resize over a binary column. The output keeps the binary
    payload (the transformed artifact) plus its typed metadata, so
    downstream stages can chain without re-decoding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": [resize_stub(b, width, height) for b in pdf[payload_col]],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling for video-shaped payloads: one output row per
    sampled frame (a 1→N mapInPandas explode — the UDTF shape). The
    stub slices fixed-stride byte windows; a real deployment seeks
    keyframes with ffmpeg at the same batch boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)
