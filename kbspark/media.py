"""Multimodal binary-column plumbing (training-pipeline addition; no
reference analog — the reference corpus is text-only, ours carries
``html:binary`` per input_hint and the same pattern extends to
image/audio/video payloads).

Design: media rides as opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The actual codec calls are STUBBED — the
image/audio libraries are not installed in this container — behind
``decoder=`` injection; the default ``DeterministicFakeDecoder`` produces
seeded, content-derived features so the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "url string, media_type string, n_bytes int, content_hash string"
)
FEATURE_SCHEMA = (
    "url string, media_type string, n_bytes int, content_hash string, "
    "feature array<float>"
)


class RealDecoderUnavailable(NotImplementedError):
    """Raised by the real-codec path: PIL/ffmpeg/torchaudio are not
    available in this environment. Inject a decoder on a cluster that
    has them."""


class DeterministicFakeDecoder:
    """Stands in for a codec: derives a fixed-dim float feature from the
    payload bytes (seeded by content hash) — deterministic across runs
    and partitionings, so downstream tests/pipelines are exact."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:4], "big")
        rng = np.random.RandomState(seed)
        return rng.rand(self.dim).astype("float32")


def real_decoder(*_args, **_kwargs):
    raise RealDecoderUnavailable(
        "image/audio codecs are not installed in this container; "
        "inject a decoder with MediaPipeline(decoder=...) on a real cluster"
    )


def media_metadata(df: DataFrame, url_col: str = "url",
                   payload_col: str = "html",
                   media_type: str = "text/html") -> DataFrame:
    """Typed metadata extraction over a binary column — narrow,
    Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "media_type": media_type,
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


def media_features(df: DataFrame, decoder=None, url_col: str = "url",
                   payload_col: str = "html",
                   media_type: str = "text/html") -> DataFrame:
    """Decode + feature-extract stage. ``decoder`` must expose
    ``features(bytes) -> np.ndarray``; defaults to the deterministic
    fake (real codecs stubbed — see module docstring)."""
    decoder = decoder or DeterministicFakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(bytes)
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "media_type": media_type,
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: decoder.features(b).tolist()
                    ),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)
