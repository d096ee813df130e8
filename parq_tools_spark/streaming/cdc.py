"""Streaming CDC apply: maintain a keyed parquet snapshot from a
change stream (beyond-reference; composes ``operators/merge.py`` with
Structured Streaming's ``foreachBatch``).

This is the continuous form of the nightly merge: each micro-batch of
change events (op/seq rows) merges into the current snapshot and the
result replaces it via a temp-dir swap. ``foreachBatch`` invocations
are strictly sequential, so batch N+1 always reads the snapshot batch
N produced — cross-batch ordering comes for free and per-batch
ordering from :func:`~parq_tools_spark.operators.merge.apply_cdc`'s
latest-wins pass.

Scale shape: with ``broadcast_source=True`` (the default — a
micro-batch is small by construction) the snapshot never shuffles:
one broadcast left join plus one key-pruned scan per batch, then a
rewrite of the snapshot files. The rewrite is the honest cost of
plain parquet — swap the sink for a Delta/Iceberg table
(``sources/table_format.py``) to turn it into a metadata commit where
a connector is available.

The directory swap is last-writer-wins on a local filesystem
(write tmp -> remove old -> rename); there is a brief window where
the path is absent, which readers must tolerate (retry) — a real
deployment points readers at a manifest or uses a table format.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame

__all__ = ["start_cdc_apply"]


def start_cdc_apply(
    changes: DataFrame,
    snapshot_path: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_source: bool = True,
    available_now: bool = True,
):
    """Start a streaming query that folds ``changes`` into the parquet
    snapshot at ``snapshot_path``.

    ``changes`` must be a streaming DataFrame carrying the key
    columns, ``op_col`` ('I'/'U'/'D') and ``seq_col``. The snapshot
    must already exist (write an initial version first).
    ``available_now=True`` drains the backlog and stops (the testing /
    catch-up trigger); pass ``False`` for a continuous query.

    Returns the started ``StreamingQuery``.
    """
    if not changes.isStreaming:
        raise ValueError(
            "start_cdc_apply needs a streaming DataFrame; "
            "use operators.merge.apply_cdc for batch change sets"
        )
    keys = list(keys)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from parq_tools_spark.operators.merge import apply_cdc

        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        snapshot = spark.read.parquet(snapshot_path)
        updated = apply_cdc(
            snapshot,
            batch_df,
            keys,
            op_col=op_col,
            seq_col=seq_col,
            broadcast_source=broadcast_source,
        )
        tmp = f"{snapshot_path}.b{batch_id}.tmp"
        # materialize BEFORE touching the current snapshot — the merge
        # plan lazily reads the files being replaced
        updated.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(snapshot_path, ignore_errors=True)
        os.replace(tmp, snapshot_path)

    writer = (
        changes.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
