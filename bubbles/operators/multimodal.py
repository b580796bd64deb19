"""Multimodal column plumbing (north-star scope).

Media (image/audio/video) are opaque BINARY columns with typed
metadata. The Spark-side plumbing — schema, partition-friendly batch
iteration, Arrow UDF signatures — is real and tested; the actual
codec work is stubbed (the runtime image has no image/audio libs):
``decode_media`` raises NotImplementedError unless
``fake_decoder=True``, which produces a deterministic fake feature
vector from the bytes so the pipeline shape can be exercised
end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)


def attach_media_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Cheap metadata that needs no codec: byte length + content hash
    (pure column expressions)."""
    m = F.col(media_col)
    return df.withColumn("n_bytes", F.octet_length(m)).withColumn(
        "content_hash", F.md5(m)
    )


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    feature_dim: int = 8,
    fake_decoder: bool = False,
) -> DataFrame:
    """media binary → feature ARRAY<DOUBLE> via mapInPandas (Arrow
    batches; one python worker per partition — the real decode path
    would call PIL/librosa here per batch).

    STUB: real codecs are unavailable in this runtime. With
    ``fake_decoder`` the features are a deterministic byte-histogram
    projection (stable across runs); otherwise NotImplementedError.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake_decoder:
                raise NotImplementedError(
                    "media codecs not available in this runtime; pass "
                    "fake_decoder=True to exercise the pipeline shape"
                )
            feats = []
            for blob in pdf[media_col]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr % feature_dim, minlength=feature_dim).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=f"{id_col} long, features array<double>"
    )


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling stub: emits (media_id, frame_idx, offset)
    rows from the metadata only — the per-frame decode itself is the
    stubbed step above. Shows the explode/partition shape the real
    operator would have."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return df.select(
        id_col,
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "offset_s"),
    ).select(
        id_col, "frame_idx", (F.col("frame_idx") * F.lit(every_ms)).alias("offset_ms")
    )
