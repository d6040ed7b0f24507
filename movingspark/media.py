"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north rule: interleaved text+media documents).

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_stub=True` produces a deterministic fake feature
vector from the bytes so the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas partitioning — is real and tested; wire a real
decoder by passing `decoder=` (bytes -> np.ndarray) in production.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
    ]
)


def media_refs_from_docs(docs: DataFrame) -> DataFrame:
    """Extract the media spans of interleaved documents as a media table
    (doc_id, offset, media_ref). The payload bytes stay out-of-band
    (object store); this engine moves references, not blobs."""
    sp = docs.select("doc_id", F.explode("spans").alias("span"))
    return sp.filter(F.col("span.kind") == "media").select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.col("span.media_ref").alias("media_ref"),
    )


def synth_media_bytes(media: DataFrame, n_bytes: int = 64) -> DataFrame:
    """Deterministic fake payloads for tests: ASCII bytes of the
    sha256 HEXDIGEST of the media_ref, repeated to n_bytes (stands in
    for an object-store fetch). ASCII (not raw digest) on purpose: the
    DuckDB oracle can then reproduce the downstream content_hash with
    md5(VARCHAR) — crypto functions there accept only strings."""

    @F.pandas_udf(T.BinaryType())
    def fetch(ref: pd.Series) -> pd.Series:
        out = []
        for r in ref:
            h = hashlib.sha256(r.encode()).hexdigest().encode()
            out.append((h * (n_bytes // len(h) + 1))[:n_bytes])
        return pd.Series(out)

    return media.withColumn("payload", fetch(F.col("media_ref")))


def _stub_decode(buf: bytes, dim: int) -> np.ndarray:
    """Deterministic fake decoder: feature vector from byte statistics.
    Replace with a real image/audio decode in production."""
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    reps = int(np.ceil(dim / max(len(a), 1)))
    return np.resize(a, dim) / 255.0 if len(a) else np.zeros(dim)


def extract_media_features(
    media_with_payload: DataFrame,
    dim: int = 16,
    decoder=None,
    batch_hint: int = 1024,
) -> DataFrame:
    """Decode/feature-extract media payloads with mapInPandas (Arrow
    batches; one python worker per partition, vectorized over the
    batch). Output: input columns minus payload, plus n_bytes,
    content_hash, feature array<double>.

    decoder: bytes -> np.ndarray[dim]; defaults to the deterministic
    stub (real decoders raise NotImplementedError paths are for the
    caller to provide — see module docstring)."""
    dec = decoder or (lambda b: _stub_decode(b, dim))
    in_cols = [c for c in media_with_payload.columns if c != "payload"]
    out_schema = T.StructType(
        [media_with_payload.schema[c] for c in in_cols]
        + [
            T.StructField("n_bytes", T.LongType()),
            T.StructField("content_hash", T.StringType()),
            T.StructField("feature", T.ArrayType(T.DoubleType())),
        ]
    )

    def batches(it):
        for pdf in it:
            feats, nb, ch = [], [], []
            for buf in pdf["payload"]:
                b = bytes(buf)
                nb.append(len(b))
                ch.append(hashlib.md5(b).hexdigest())
                feats.append(dec(b).tolist())
            out = pdf[in_cols].copy()
            out["n_bytes"] = pd.Series(nb, index=pdf.index, dtype="int64")
            out["content_hash"] = pd.Series(ch, index=pdf.index)
            out["feature"] = pd.Series(feats, index=pdf.index)
            yield out

    return media_with_payload.mapInPandas(batches, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands each video ref into frame-task
    rows (ref, frame_index) without decoding — the shuffle-able work
    list a real frame extractor consumes. Deterministic frame count
    stub: derived from the ref hash (stands in for container metadata)."""
    n_frames = (F.abs(F.hash("media_ref")) % 300 + 1).alias("n_frames")
    with_n = media.select("*", n_frames)
    return with_n.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_index"),
    ).drop("n_frames")
