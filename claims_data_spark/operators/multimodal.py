"""Multimodal (image/audio/video) column plumbing.

Engine extension for training-data pipelines: media travel as opaque
``binary`` columns with a typed metadata struct; decode / resize /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
stages so each Python crossing handles thousands of rows.

External codecs (PIL/ffmpeg/librosa) are NOT available in this
container. ``deterministic_fake`` mode derives stable pseudo-features
from the bytes themselves (so the distributed plumbing — schema,
batching, partition behavior — is fully testable); ``strict`` mode
requires an injected codec and raises otherwise. A REAL pure-python
decode path ships in :mod:`claims_data_spark.operators.codecs`
(byte-level BMP and RIFF/PCM WAV parsers) and plugs in via
``extract_features(mode='strict', codec=pure_python_codec)``; video
frame decode remains stubbed (no self-contained pure-python format).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media embedding: unit-range
    floats derived from the SHA-256 of the bytes."""
    h = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame,
    mode: str = "deterministic_fake",
    dim: int = 8,
    codec=None,
) -> DataFrame:
    """Feature-extraction stage over binary media columns.

    ``mapInPandas`` keeps the decode vectorized per Arrow batch; at
    scale, partition the media table by size bucket first so batches
    have uniform decode cost (skew in media size = skew in task time).

    ``codec`` is the pluggable decode step: a picklable callable
    ``(media_type: str, content: bytes) -> list[float]`` shipped to
    executors inside the kernel closure. A PIL/ffmpeg-backed codec
    plugs in here unchanged; tests inject a fake to exercise the
    ``strict`` path. ``strict`` without a codec raises — the honest
    stub, since this container has no media libraries.
    """
    if mode not in ("deterministic_fake", "strict"):
        raise ValueError(mode)
    if mode == "strict" and codec is None:
        raise NotImplementedError(
            "no codec injected: pass codec=(media_type, content) -> "
            "list[float] — e.g. operators.codecs.pure_python_codec "
            "(real BMP/WAV byte-level decode, no external libs), or a "
            "PIL/ffmpeg-backed callable where those are installed; or "
            "run with mode='deterministic_fake'"
        )
    if codec is None:
        codec = lambda _mt, content: _fake_feature(content, dim)  # noqa: E731

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: len(b or b"")).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        codec(mt, b)
                        for mt, b in zip(pdf["media_type"], pdf["content"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    mode: str = "deterministic_fake",
    frame_codec=None,
) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame.

    Stubbed like ``extract_features``: fake mode emits one row per
    ``every_ms`` of ``meta.duration_ms`` with a per-frame sha — the
    explode shape, schema, and partitioning are the real thing.
    ``frame_codec`` is the pluggable seek+hash step
    ``(content: bytes, ts_ms: int) -> str``; ``strict`` without one
    raises.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )
    if mode == "strict" and frame_codec is None:
        # a real pure-python codec exists — require the caller to opt
        # in explicitly rather than silently defaulting to it
        raise NotImplementedError(
            "strict frame_sample needs an explicit frame_codec; pass "
            "claims_data_spark.operators.codecs.video_frame_sha for "
            "the pure-python uncompressed-AVI parser"
        )
    if frame_codec is None:
        frame_codec = lambda content, ts: hashlib.sha256(  # noqa: E731
            (content or b"") + int(ts).to_bytes(8, "little")
        ).hexdigest()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"]["duration_ms"] or 0) if r["meta"] is not None else 0
                for i, ts in enumerate(range(0, max(int(dur), 1), every_ms)):
                    sha = frame_codec(r["content"], ts)
                    rows.append((int(r["media_id"]), i, ts, sha))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha"])

    return media.filter(F.col("media_type") == "video").mapInPandas(kernel, schema=schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
    ]
)


def image_resize(
    media: DataFrame,
    width: int,
    height: int,
    method: str = "nearest",
) -> DataFrame:
    """Image resize stage over BMP ``content`` — the missing quarter of
    the decode / resize / feature-extract / frame-sample set, and a
    REAL one: byte-level BMP parse (``codecs.decode_bmp``), numpy
    index-map resample, byte-level re-encode (``codecs.encode_bmp``).

    ``method='nearest'``: output pixel (r, c) = input pixel
    (floor(r·H/h), floor(c·W/w)) — pure integer index arithmetic, so
    the resample is deterministic and ANALYTICALLY checkable (the
    oracle recomputes ``pixel_sum`` from the source pattern without
    decoding anything). ``method='area'``: block mean with TRUNCATING
    integer division — chosen over float mean so every engine/retry
    computes identical bytes.

    Output carries the re-encoded BMP plus ``pixel_sum`` (the integer
    sum over all output channels — the cheap integrity check a 100 TB
    pipeline logs per shard).  One Arrow ``mapInPandas`` crossing,
    map-only, no shuffle; Python is unavoidable here (byte-level
    format parsing + array resampling have no Catalyst expression
    form), which is the documented impossibility argument.
    """
    if method not in ("nearest", "area"):
        raise ValueError("method must be 'nearest' or 'area'")
    if width < 1 or height < 1:
        raise ValueError("target dims must be >= 1")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from claims_data_spark.operators.codecs import decode_bmp, encode_bmp

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                h0, w0, px = decode_bmp(bytes(r["content"]))
                if method == "nearest":
                    ri = (np.arange(height) * h0) // height
                    ci = (np.arange(width) * w0) // width
                    out = px[ri][:, ci]
                else:
                    # area: truncating integer mean over each source
                    # block, as a two-step reduction (rows, then cols)
                    rmap = (np.arange(h0) * height) // h0
                    cmap = (np.arange(w0) * width) // w0
                    acc = np.zeros((height, w0, 3), dtype=np.int64)
                    cnt_r = np.zeros((height, 1, 1), dtype=np.int64)
                    np.add.at(acc, rmap, px.astype(np.int64))
                    np.add.at(cnt_r, rmap.reshape(-1), 1)
                    acc2 = np.zeros((height, width, 3), dtype=np.int64)
                    cnt_c = np.zeros((width,), dtype=np.int64)
                    np.add.at(acc2.transpose(1, 0, 2), cmap, acc.transpose(1, 0, 2))
                    np.add.at(cnt_c, cmap, 1)
                    out = (
                        acc2 // (cnt_r * cnt_c.reshape(1, -1, 1))
                    ).astype(np.uint8)
                content = encode_bmp(out.astype(np.uint8))
                rows.append(
                    (
                        int(r["media_id"]),
                        content,
                        width,
                        height,
                        int(out.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "content", "out_width", "out_height",
                    "pixel_sum",
                ],
            )

    return media.select("media_id", "content").mapInPandas(
        kernel, RESIZED_SCHEMA
    )
