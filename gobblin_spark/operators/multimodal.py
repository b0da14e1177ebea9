"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over mapInPandas — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested; the actual codec
calls are STUBBED deterministically because no image/audio libraries ship in
this environment. Each stub is clearly marked and isolated behind
``_decode_impl`` so a real codec drops in without touching the Spark shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, feat_dim int, features array<double>, "
    "decode_ok boolean"
)

FRAME_SCHEMA = (
    "doc_id long, frame_idx int, ts_ms int, frame_digest string"
)


def _md5_slice_int(col, start: int) -> F.Column:
    """Portable deterministic int from an md5 slice (8 hex chars) — the same
    value is computable in any engine with md5/substr, so media fixtures are
    oracle-checkable."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("long")


def synth_media(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media rows derived from a text table — gives the
    multimodal path real bytes to move (payload = repeated sha of the text,
    512 B), with plausible metadata. All derivations are md5/sha-based so an
    independent SQL engine can replay them exactly."""
    t = F.col(text_col)
    payload = F.to_binary(F.repeat(F.sha2(t, 256), 8), F.lit("hex"))
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(_md5_slice_int(t, 1), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        mt.alias("media_type"),
        (F.pmod(_md5_slice_int(t, 9), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(_md5_slice_int(t, 17), F.lit(1080)) + 1).cast("int").alias("height"),
        F.pmod(_md5_slice_int(t, 25), F.lit(60000)).cast("int").alias("duration_ms"),
        payload.alias("payload"),
    )


def _decode_impl(payload: bytes, media_type: str) -> bytes:
    """STUB — the real decode (PIL/ffmpeg/soundfile) is unavailable in this
    container. Deterministic fake: the 'decoded' buffer is
    sha256(hex(payload)) + sha256(hex(payload) + ':1') (64 B) — hashed over
    the lowercase-hex encoding so a SQL oracle without blob hashing can
    replay it, keeping the whole multimodal pipeline under the value-hash
    correctness gate. Replace with a real codec to productionize; the Spark
    plumbing does not change."""
    h = payload.hex().encode()
    return hashlib.sha256(h).digest() + hashlib.sha256(h + b":1").digest()


def extract_features(df: DataFrame, feat_dim: int = 16,
                     batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches, vectorized
    inside each batch with pandas/hashlib — no per-row Spark Python calls).

    Output: fixed-dim float features per row. Partitioning is preserved;
    at scale, repartition upstream by size so each Arrow batch holds
    ~batch_hint rows of payloads that fit executor memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            ok = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                try:
                    decoded = _decode_impl(bytes(payload), mt)
                    # deterministic fake featurization: bytes → floats
                    vec = [
                        int.from_bytes(decoded[i * 4 : i * 4 + 4], "big")
                        / 2**32
                        for i in range(feat_dim)
                    ]
                    feats.append(vec)
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feat_dim": feat_dim,
                    "features": feats,
                    "decode_ok": ok,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  max_frames: int = 16) -> DataFrame:
    """Frame sampling for video rows: 1→many explode of (frame_idx, ts_ms)
    with a deterministic per-frame digest standing in for the decoded frame.
    The explode is pure JVM; only the digest is stubbed."""
    video = df.filter(F.col("media_type") == "video/mp4")
    n_frames = F.least(
        (F.col("duration_ms") / F.lit(every_ms)).cast("int") + 1,
        F.lit(max_frames),
    )
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    # digest over the hex encoding (portable: SQL oracles lack blob hashing)
    out = video.select(F.col("doc_id"), F.col("duration_ms"),
                       F.sha2(F.lower(F.hex(F.col("payload"))), 256).alias("__p"),
                       idx)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("int"),
        (F.col("frame_idx") * every_ms).cast("int").alias("ts_ms"),
        F.md5(F.concat_ws(":", F.col("__p"),
                          F.col("frame_idx").cast("string"))).alias("frame_digest"),
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updated JVM-side; payload re-digested via
    the stubbed decode path (real resize would run here, same shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            out["payload"] = [
                _decode_impl(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)
