"""Space-filling curves for clustering: Morton (bit interleave) and a
REAL Hilbert curve.

The reference accepts ``strategy: 'hilbert'`` but has no distinct Hilbert
implementation — it silently falls back to Morton (SURVEY §2.8,
/root/reference/src/compaction/index.ts:1149-1279). We implement the
genuine article: Skilling's axes→transpose algorithm (J. Skilling,
"Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — public
domain algorithm), vectorized with numpy over Arrow batches. Hilbert
ordering has strictly better locality than Morton (no long diagonal
jumps), which tightens per-file min/max ranges and therefore improves
data skipping on clustered columns.

The curve computation is a layout-maintenance job (not a query hot path),
so an Arrow-batched pandas UDF is the right cost profile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hilbert_index_np", "hilbert_expr", "max_bits_per_dim"]


def max_bits_per_dim(num_dims: int) -> int:
    """Total index bits must fit a signed long."""
    return 63 // num_dims


def hilbert_index_np(X: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert index for each row of ``X`` (shape (n, d), non-negative
    ints < 2**bits). Returns int64 of d*bits significant bits."""
    X = X.astype(np.uint64).copy()
    n, d = X.shape
    M = np.uint64(1) << np.uint64(bits - 1)

    # axes → transposed Hilbert coordinates (Skilling, vectorized)
    Q = M
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        for i in range(d):
            mask = (X[:, i] & Q) != 0
            X[mask, 0] ^= P
            inv = ~mask
            t = (X[inv, 0] ^ X[inv, i]) & P
            X[inv, 0] ^= t
            X[inv, i] ^= t
        Q >>= one

    # Gray decode
    for i in range(1, d):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    Q = M
    while Q > one:
        mask = (X[:, d - 1] & Q) != 0
        t[mask] ^= Q - one
        Q >>= one
    X ^= t[:, None]

    # interleave transposed bits, MSB first
    out = np.zeros(n, dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(d):
            out = (out << one) | ((X[:, i] >> np.uint64(b)) & one)
    return out.astype(np.int64)


def hilbert_expr(dim_cols: list[Column], bits: int) -> Column:
    """Column expression: Hilbert index of the given integer dimension
    columns (each already scaled to [0, 2**bits))."""
    from pyspark.sql.functions import pandas_udf

    d = len(dim_cols)
    if d * bits > 63:
        raise ValueError(
            f"{d} dims × {bits} bits exceeds 63 index bits; "
            f"use bits <= {max_bits_per_dim(d)}"
        )

    @pandas_udf("long")
    def h(arrs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(a, dtype=np.int64) for a in arrs])
        return pd.Series(hilbert_index_np(X, bits))

    return h(F.array(*[c.cast("long") for c in dim_cols]))
