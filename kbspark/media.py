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
    """Stands in for a codec: derives a fixed-dim float feature directly
    from the sha256 digest of the payload bytes — deterministic across
    runs and partitionings, AND replayable in plain SQL (lane i =
    uint16 of digest bytes [2i, 2i+1) / 65536, exactly representable in
    float32), so the feature stage is value-oracle-checkable end-to-end
    (the m_media_features DuckDB oracle recomputes the lanes from
    SHA256 hex substrings)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def features(self, payload: bytes) -> np.ndarray:
        # extend the lane material by chained digests for dim > 16
        material = hashlib.sha256(payload).digest()
        while len(material) < 2 * self.dim:
            material += hashlib.sha256(material[-32:]).digest()
        lanes = [
            int.from_bytes(material[2 * i : 2 * i + 2], "big") / 65536.0
            for i in range(self.dim)
        ]
        return np.asarray(lanes, dtype="float32")


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


FRAME_SCHEMA = (
    "url string, frame_idx int, frame_feature array<float>"
)


def frame_sample(df: DataFrame, n_frames: int = 4, decoder=None,
                 url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Frame-sampling stage (video/audio shape): payload → ``n_frames``
    evenly-spaced frames, one output row per frame with its feature
    vector. Real codec stubbed (DeterministicFakeDecoder derives each
    frame's feature from payload-hash + frame index); the Spark-side
    explode/batch/schema plumbing is real."""
    decoder = decoder or DeterministicFakeDecoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, feats = [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                data = bytes(payload)
                for i in range(n_frames):
                    urls.append(url)
                    idxs.append(i)
                    feats.append(
                        decoder.features(data + i.to_bytes(4, "big")).tolist()
                    )
            yield pd.DataFrame(
                {"url": urls, "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_feature": feats}
            )

    return df.select(url_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "url string, n_bytes_in int, n_bytes_out int, resized binary"


def resize(df: DataFrame, target_bytes: int = 256, decoder=None,
           url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """Resize/transcode stage shape: payload → bounded-size derived
    payload. Stub: deterministic truncation+digest (a real image resize
    plugs in via ``decoder`` with a ``resize(bytes, target) -> bytes``)."""

    def fake_resize(data: bytes, target: int) -> bytes:
        digest = hashlib.sha256(data).digest()
        return (digest * (target // len(digest) + 1))[:target]

    if decoder is None:
        resize_fn = fake_resize
    else:
        resize_fn = getattr(decoder, "resize", None)
        if resize_fn is None:
            # never silently fall back to the fake when a real codec was
            # injected (round-3 review: silent-degradation class)
            raise RealDecoderUnavailable(
                f"{type(decoder).__name__} does not implement "
                "resize(bytes, target) -> bytes"
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col].map(bytes)
            out = payloads.map(lambda b: resize_fn(b, target_bytes))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "n_bytes_in": payloads.map(len).astype("int32"),
                    "n_bytes_out": out.map(len).astype("int32"),
                    "resized": out,
                }
            )

    return df.select(url_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)


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
