"""Document chunking and sequence packing for training pipelines.

Two operations every LLM data pipeline runs between curation and
tokenization, absent from the reference (it has no text operators at
all) and from Spark's built-ins:

- ``chunk_text`` — split long documents into fixed-size (optionally
  overlapping) character windows, one output row per chunk. Pure JVM
  expressions (``sequence`` → ``transform`` → ``explode``): cost is
  O(output chars), no shuffle, no Python.
- ``pack_greedy`` — assign variable-length items to fixed-capacity bins
  ("sequence packing"): items are laid out in a deterministic order and
  a running-sum window maps each to ``floor(preceding_total/capacity)``.
  This is offset packing — contiguous fill, one shuffle on the
  partition key; a bin may overflow by at most one item, which training
  loaders handle by truncation. True first-fit-decreasing is inherently
  sequential and needs no distributed version: the sort already places
  equal-size runs together, and per-key layout is reproducible, which
  matters more for training (same bins every run) than the last few
  percent of fill.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["chunk_text", "pack_greedy"]


def chunk_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 0,
    chunk_id_col: str = "chunk_id",
    chunk_col: str = "chunk",
) -> DataFrame:
    """Explode each document into character-window chunks.

    Chunk ``i`` covers ``[i*step, i*step + chunk_chars)`` with
    ``step = chunk_chars - overlap``; the final chunk is short. Empty
    documents produce no rows. Columns other than ``text_col`` pass
    through unchanged (so ids/metadata ride along with every chunk).
    """
    if not 0 <= overlap < chunk_chars:
        raise ValueError("overlap must be in [0, chunk_chars)")
    step = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    # floor at one chunk: for 0 < len <= overlap the raw formula goes to
    # 0 or negative, and Spark's sequence(0, -1) counts DOWN, emitting
    # phantom negative chunk ids (whole short doc = one chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(step)), F.lit(1)
    ).cast("int")
    pieces = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias(chunk_id_col),
            t.substr(i * step + 1, F.lit(chunk_chars)).alias(chunk_col),
        ),
    )
    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.filter(n > 0)
        .select(*passthrough, F.explode(pieces).alias("__piece"))
        .select(
            *passthrough,
            F.col(f"__piece.{chunk_id_col}").alias(chunk_id_col),
            F.col(f"__piece.{chunk_col}").alias(chunk_col),
        )
    )


def pack_greedy(
    df: DataFrame,
    *,
    size_col: str,
    capacity: int,
    partition_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Assign each row a bin id by contiguous fill in a deterministic
    order: ``bin = floor(running_total_before_row / capacity)``.

    One window shuffle per call (on ``partition_cols``); bins are
    per-partition. ``order_cols`` defaults to ``size_col`` descending —
    large items first packs tighter and keeps layout stable run-to-run.
    """
    parts = partition_cols or []
    if order_cols:
        order = [F.col(c) for c in order_cols]
    else:
        # desc(size) alone is not a total order — tied sizes would get
        # shuffle-order-dependent bins. Tiebreak on every remaining
        # column so the layout is reproducible whenever rows are unique.
        order = [F.desc(size_col)] + [
            F.asc(c) for c in df.columns
            if c != size_col and c not in parts
        ]
    w = (
        Window.partitionBy(*parts)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = F.sum(size_col).over(w) - F.col(size_col)
    return df.withColumn(
        bin_col, F.floor(pre / F.lit(capacity)).cast("long")
    )
