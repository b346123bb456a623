"""Lineage-cut strategy for iterative operators (CC, PageRank, HITS,
LPA, BFS, k-core, BPE): local vs reliable checkpointing.

Every iterative DataFrame loop must cut its lineage each round —
otherwise round i's plan nests and REPLAYS every earlier round's
join+agg (quadratic re-execution), and past a few dozen rounds the
plan itself overwhelms the optimizer. Two cut strategies:

- ``checkpoint_dir=None`` (default): ``localCheckpoint`` /
  persist+materialize. Blocks live in EXECUTOR storage with truncated
  lineage — fast and fine on ``local[k]``, but on a real cluster an
  executor loss mid-iteration loses blocks that can no longer be
  recomputed, killing the job. This is the right default for
  interactive/local work and bounded-round loops.

- ``checkpoint_dir=<path>``: RELIABLE checkpoint — sets the Spark
  context's checkpoint dir (HDFS/S3/shared FS on a real cluster) and
  writes each round's frame there, so a 100-executor run survives
  executor loss mid-iteration at the cost of one distributed write
  per round. This is the 100 TB production setting.

Both strategies produce IDENTICAL results (pinned by
tests/test_iterative_checkpoint.py); only fault-tolerance and the
round-boundary I/O differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(
    df: DataFrame,
    *,
    checkpoint_dir: str | None = None,
    eager: bool = True,
) -> DataFrame:
    """Cut ``df``'s lineage: ``localCheckpoint`` when ``checkpoint_dir``
    is None, reliable ``checkpoint`` into ``checkpoint_dir`` otherwise.

    Setting the checkpoint dir is idempotent per path (Spark creates a
    per-context subdirectory under it); callers on a real cluster pass
    a fault-tolerant URI (``hdfs://…``, ``s3a://…``).
    """
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None or not str(
            sc.getCheckpointDir()).startswith(str(checkpoint_dir)):
        sc.setCheckpointDir(str(checkpoint_dir))
    return df.checkpoint(eager=eager)


def materialize_round(
    df: DataFrame,
    stale: DataFrame | None,
    *,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Materialize one loop round and release the previous one.

    The persist-loop idiom shared by the graph family: persist the
    round's frame, materialize it NOW (so the next round's plan reads
    cache instead of nesting this round's computation), and unpersist
    the previous round's frame. With ``checkpoint_dir`` set, the frame
    is reliably checkpointed instead (eager — the write is the
    materialization) and there is no executor-storage bookkeeping.

    Returns ``(materialized_df, new_stale)`` — thread ``new_stale``
    back in on the next call.
    """
    if checkpoint_dir is None:
        df = df.persist()
        df.count()
        if stale is not None:
            stale.unpersist()
        return df, df
    return cut_lineage(df, checkpoint_dir=checkpoint_dir, eager=True), stale
