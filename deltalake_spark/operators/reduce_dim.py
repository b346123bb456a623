"""Embedding dimensionality reduction: JL signed random projection and
one-pass distributed PCA.

North-star LLM-pipeline surface (the reference engine has no vector ops
at all — src/query/index.ts is filters/projections/pipelines): shrinking
``array<float>`` embedding columns is the standard preprocessing step
before ANN indexing / clustering at corpus scale.

Scale shapes:

- :func:`jl_project` — a Johnson-Lindenstrauss signed (±1) projection
  evaluated ENTIRELY JVM-side as literal-folded ``zip_with``/
  ``aggregate`` expressions (same technique as the IVF probe in
  ``similarity.py``): map-only, whole-stage codegen, zero shuffles, no
  Python workers. Components are quantized to an integer grid first
  (``round(e * scale)``), which makes every projected coordinate an
  exact integer — reproducible across engines and partitionings, which
  is what gives the gate query a value-level DuckDB oracle.
- :func:`pca_fit` — one distributed pass computes the count / sum /
  gram-matrix partials per Arrow batch (``mapInPandas`` over numpy
  matmuls), reduced driver-side (partials are ~d² doubles — KB-scale
  for d=64 regardless of corpus size, the right cost model at 100 TB);
  eigendecomposition of the covariance happens on the driver.
  :func:`pca_transform` then projects distributively with a broadcast
  component matrix (Arrow matmul, map-only).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["jl_signs", "jl_project", "pca_fit", "pca_transform"]


def jl_signs(out_dim: int, dim: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 projection planes from an LCG — the SAME list is
    reproducible anywhere (the DuckDB oracle embeds it as literals), no
    global random state."""
    planes = []
    for d in range(out_dim):
        row = []
        for i in range(dim):
            x = (1103515245 * (d * dim + i + seed) + 12345) % (1 << 31)
            row.append(1 if (x >> 16) & 1 == 0 else -1)
        planes.append(row)
    return planes


def jl_project(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_dim: int = 8,
    dim: int = 64,
    scale: int = 1000,
    seed: int = 7,
    prefix: str = "proj_",
) -> DataFrame:
    """Append ``out_dim`` integer projection columns ``proj_0..`` =
    ``Σ_i round(e_i * scale) * s_di`` with ±1 signs from
    :func:`jl_signs`.

    All arithmetic is JVM-side on bigints (exact — no float summation
    order anywhere), built as one SQL string per column to avoid py4j
    round-trip cost (see ``similarity._probe_expr``)."""
    signs = jl_signs(out_dim, dim, seed)
    qcol = "__jl_q"
    while qcol in df.columns:  # never clobber a caller column
        qcol += "_"
    quant = (f"transform(cast(`{vec_col}` as array<double>), "
             f"e -> cast(round(e * {float(scale)!r}D) as bigint))")
    out = df.withColumn(qcol, F.expr(quant))
    for d in range(out_dim):
        lits = ",".join(f"{s}L" for s in signs[d])
        expr = (f"aggregate(zip_with(`{qcol}`, array({lits}), "
                f"(x, y) -> x * y), cast(0 as bigint), (a, x) -> a + x)")
        out = out.withColumn(f"{prefix}{d}", F.expr(expr))
    return out.drop(qcol)


_PARTIAL_SCHEMA = ("n long, s array<double>, g array<double>")


def pca_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 8,
) -> dict:
    """One-pass distributed PCA fit: per-Arrow-batch partials
    ``(n, Σx, ΣxᵀX)`` via numpy, reduced on the driver (bounded:
    #batches × (d + d²) doubles), then covariance eigendecomposition.

    Returns ``{"mean": [d], "components": [k][d], "explained": [k],
    "n": int}`` with components sorted by descending eigenvalue.
    Deterministic sign convention: each component's largest-|coord|
    entry is made positive."""
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            vs = pdf[vec_col].dropna()
            if not len(vs):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            yield pd.DataFrame({
                "n": [len(X)],
                "s": [X.sum(axis=0).tolist()],
                "g": [(X.T @ X).ravel().tolist()],
            })

    rows = df.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(len(comps)):                 # deterministic signs
        j = int(np.abs(comps[i]).argmax())
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained": evals[order].tolist(),
        "n": int(n),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto the fitted components: Arrow-batched numpy
    matmul with the (k×d) component matrix captured in the closure —
    broadcast-by-serialization, map-only, zero shuffle."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )

    def project(batches):
        for pdf in batches:
            out = []
            for v in pdf[vec_col]:
                if v is None:
                    out.append(None)
                    continue
                x = np.asarray(v, dtype=np.float64) - mean
                out.append((comps @ x).tolist())
            yield pdf.assign(**{out_col: out})

    return df.mapInPandas(project, schema)
