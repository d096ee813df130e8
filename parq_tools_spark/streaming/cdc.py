"""Streaming CDC apply: maintain a keyed parquet snapshot from a
change stream (beyond-reference; composes ``operators/merge.py`` with
Structured Streaming's ``foreachBatch``).

This is the continuous form of the nightly merge: each micro-batch of
change events (op/seq rows) merges into the current snapshot and the
result replaces it via a crash-safe two-rename swap. ``foreachBatch``
invocations are strictly sequential, so batch N+1 always reads the
snapshot batch N produced; per-batch ordering comes from
:func:`~parq_tools_spark.operators.merge.apply_cdc`'s latest-wins
pass, and CROSS-batch ordering from the persisted per-key seq
(``track_seq=True``, the default): the snapshot carries a reserved
``__cdc_seq`` column holding the last applied sequence per key, and
an event only applies when its seq is strictly newer — so a late
micro-batch delivering stale (lower-seq) events cannot overwrite
newer state, and checkpoint-replayed batches are idempotent. With
``track_seq=False`` ordering degrades to arrival-order-wins and the
stream MUST deliver events in seq order. Readers of the snapshot
should drop ``__cdc_seq`` (or use :func:`read_snapshot`).

Crash safety: the swap is write(tmp) -> rename(current, .old) ->
rename(tmp, current) -> delete(.old). Both renames are atomic, and a
full snapshot exists on disk at every instant — a crash between the
renames leaves ``.old``, which the next batch (or restart) restores
before Spark's checkpoint replays the interrupted micro-batch. There
is still a brief reader-visible window where the primary path is
absent during the swap; readers must tolerate a retry — a real
deployment points readers at a manifest or uses a table format.

Scale shape: with ``broadcast_source=True`` (the default — a
micro-batch is small by construction) the snapshot never shuffles:
one broadcast left join plus one key-pruned scan per batch, then a
rewrite of the snapshot files. The rewrite is the honest cost of
plain parquet — swap the sink for a Delta/Iceberg table
(``sources/table_format.py``) to turn it into a metadata commit where
a connector is available.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["start_cdc_apply", "read_snapshot", "SEQ_STATE_COL"]

#: Reserved snapshot column recording the last applied seq per key.
SEQ_STATE_COL = "__cdc_seq"


def read_snapshot(spark: SparkSession, snapshot_path: str) -> DataFrame:
    """Read a CDC-maintained snapshot without its bookkeeping column,
    recovering a half-finished swap first if one is found."""
    _recover_swap(snapshot_path)
    df = spark.read.parquet(snapshot_path)
    return df.drop(SEQ_STATE_COL) if SEQ_STATE_COL in df.columns else df


def _recover_swap(snapshot_path: str) -> None:
    """Repair the on-disk state after a crash mid-swap. Idempotent.

    Invariant of the swap order: at most one of {primary missing,
    stale ``.old`` present} can need fixing, and ``.old`` is always a
    complete snapshot when the primary is absent.
    """
    old = snapshot_path + ".old"
    if os.path.exists(snapshot_path):
        # crash after the second rename but before cleanup: primary is
        # complete and newer, the leftover .old just needs removing
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        # crash between the two renames: restore the previous snapshot;
        # the checkpointed micro-batch will re-run against it
        os.replace(old, snapshot_path)


def start_cdc_apply(
    changes: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_source: bool = True,
    available_now: bool = True,
    track_seq: bool = True,
):
    """Start a streaming query that folds ``changes`` into the parquet
    snapshot at ``snapshot_path``.

    ``changes`` must be a streaming DataFrame carrying the key
    columns, ``op_col`` ('I'/'U'/'D') and ``seq_col``. The snapshot
    must already exist (write an initial version first; it needs no
    ``__cdc_seq`` column — one is added on the first batch when
    ``track_seq=True``). ``available_now=True`` drains the backlog and
    stops (the testing / catch-up trigger); pass ``False`` for a
    continuous query.

    Returns the started ``StreamingQuery``.
    """
    if not changes.isStreaming:
        raise ValueError(
            "start_cdc_apply needs a streaming DataFrame; "
            "use operators.merge.apply_cdc for batch change sets"
        )
    keys = list(keys)
    seq_type = changes.schema[seq_col].dataType

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from parq_tools_spark.operators.merge import apply_cdc

        if not batch_df.take(1):
            return
        _recover_swap(snapshot_path)
        spark = batch_df.sparkSession
        snapshot = spark.read.parquet(snapshot_path)
        if track_seq and SEQ_STATE_COL not in snapshot.columns:
            snapshot = snapshot.withColumn(
                SEQ_STATE_COL, F.lit(None).cast(seq_type)
            )
        updated = apply_cdc(
            snapshot,
            batch_df,
            keys,
            op_col=op_col,
            seq_col=seq_col,
            broadcast_source=broadcast_source,
            target_seq_col=SEQ_STATE_COL if track_seq else None,
        )
        tmp = f"{snapshot_path}.b{batch_id}.tmp"
        old = snapshot_path + ".old"
        # materialize BEFORE touching the current snapshot — the merge
        # plan lazily reads the files being replaced
        updated.write.mode("overwrite").parquet(tmp)
        os.replace(snapshot_path, old)
        os.replace(tmp, snapshot_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        changes.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
