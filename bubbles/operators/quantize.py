"""Embedding quantization — the storage/serving compression step for
100 TB embedding tables (FAISS SQ8 shape): float32/64 vectors become
int8 codes + one per-vector scale, an ~4-8× size cut that ANN recall
tolerates.

``quantize_embeddings``: symmetric per-vector scalar quantization —
``scale = max(abs(v))``, ``q_i = floor(v_i * qmax / scale)`` with
``qmax = 2^(bits-1) - 1`` (127 for int8). floor (round-toward-minus-
infinity) instead of round-half-up: both engines floor the SAME IEEE
double (the multiply/divide sequence is pinned), so codes are
bit-identical cross-engine — the parity rule every exact twin in this
repo uses. An all-zero vector gets scale 0 and all-zero codes. NULL
vectors pass through with NULL codes (the ANN family's NULL-exclusion
contract).

Pure projection: zero shuffles, scan speed at any table size. The
codes stay an ``array<int>`` column — downstream scoring either
dequantizes (``q_i * scale / qmax``) or runs integer dot products
directly (int8·int8 fits int32 up to 16k dims).

Max reconstruction error per component is ``scale/qmax`` (~0.8% of
the vector's max magnitude at int8), pinned by pytest against the
exact vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """(id, n_dims, scale, codes) — symmetric per-vector scalar
    quantization (see module docstring)."""
    if not (2 <= bits <= 16):
        raise ValueError(f"bits must be in [2, 16], got {bits}")
    qmax = (1 << (bits - 1)) - 1
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    codes = F.when(amax > 0.0, F.transform(
        v, lambda x: F.floor(x * F.lit(float(qmax)) / amax).cast("int")
    )).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col),
        # size(NULL) is -1 under legacy sizeOfNull — a NULL vector's
        # n_dims must be NULL like its codes/scale, not a fake
        # "negative-dimension" row a consistency check would flag
        F.when(F.col(vec_col).isNotNull(), F.size(v))
        .cast("long")
        .alias("n_dims"),
        amax.alias("scale"),
        F.when(F.col(vec_col).isNotNull(), codes).alias("codes"),
    )


def dequantize_expr(codes, scale, bits: int = 8):
    """Column expression: approximate float vector back from codes."""
    qmax = float((1 << (bits - 1)) - 1)
    return F.transform(codes, lambda q: q.cast("double") * scale / F.lit(qmax))
