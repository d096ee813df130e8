"""Streaming CDC apply: maintain a keyed parquet snapshot from a
change stream (beyond-reference; composes ``operators/merge.py`` with
Structured Streaming's ``foreachBatch``).

This is the continuous form of the nightly merge: each micro-batch of
change events (op/seq rows) merges into the current snapshot and the
result becomes the new current version. ``foreachBatch`` invocations
are strictly sequential, so batch N+1 always reads the snapshot batch
N produced; per-batch ordering comes from
:func:`~parq_tools_spark.operators.merge.apply_cdc`'s latest-wins
pass, and CROSS-batch ordering from the persisted per-key seq
(``track_seq=True``, the default): the snapshot carries a reserved
``__cdc_seq`` column holding the last applied sequence per key, and
an event only applies when its seq is strictly newer — so a late
micro-batch delivering stale (lower-seq) events cannot overwrite
newer state, and checkpoint-replayed batches are idempotent. With
``track_seq=False`` ordering degrades to arrival-order-wins and the
stream MUST deliver events in seq order. Readers of the snapshot
should use :func:`read_snapshot` (resolves the current version and
drops ``__cdc_seq``).

Commit protocol — versioned manifest, no directory renames (the same
protocol as ``operators/incremental_agg.py``, through the Hadoop
``FileSystem`` API so it holds on ``file:``/``hdfs:``/``s3a:``
alike): the initial snapshot is plain parquet at ``snapshot_path``
(version 0); each batch writes a fresh ``v=<n>/`` parquet directory
and then writes ``v=<n>/_COMMITTED`` LAST — a small marker file whose
atomic appearance (tmp+rename where rename is atomic, single PUT on
object stores) is the commit point. Readers resolve the highest
committed version, so a crash mid-batch leaves an uncommitted v-dir
that is simply invisible and is swept by the next batch; the
previous version outlives its successor by one batch so in-flight
readers finish. The marker also records the batch id + checkpoint, so
a checkpoint replay of an already-committed batch is skipped outright
(and would be harmless anyway under ``track_seq``).

Scale shape: with ``broadcast_source=True`` (the default — a
micro-batch is small by construction) the snapshot never shuffles:
one broadcast left join plus one key-pruned scan per batch, then a
rewrite of the snapshot files. The rewrite is the honest cost of
plain parquet — swap the sink for a Delta/Iceberg table
(``sources/table_format.py``) to turn it into a metadata commit where
a connector is available.
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parq_tools_spark.sources.statefs import StateFS, VersionedState

__all__ = ["start_cdc_apply", "read_snapshot", "SEQ_STATE_COL"]

#: Reserved snapshot column recording the last applied seq per key.
SEQ_STATE_COL = "__cdc_seq"

_COMMIT = "_COMMITTED"


def _vstate(spark: SparkSession, path: str) -> VersionedState:
    # shared versioned-manifest protocol (sources/statefs.py)
    return VersionedState(spark, path, _COMMIT)


def _read_current(
    spark: SparkSession, vs: VersionedState, version: Optional[int]
) -> DataFrame:
    from parq_tools_spark.sources.parquet_io import read_parquet

    if version is not None:
        return read_parquet(spark, vs.version_dir(version))
    # bootstrap: plain parquet at the root. If an aborted first batch
    # left an uncommitted v-dir, a bare directory read would sweep it
    # in as a partition — pin the read to the root-level files then.
    status = vs.fs.list_status(vs.root)
    if any(VersionedState._V_RE.match(n) and d for n, d, _ in status):
        files = [
            f"{vs.root}/{n}"
            for n, d, _ in status
            if not d and n.endswith(".parquet")
        ]
        return spark.read.parquet(*files)
    return read_parquet(spark, vs.root)


def read_snapshot(
    spark: SparkSession, snapshot_path: str, with_seq: bool = False
) -> DataFrame:
    """Read a CDC-maintained snapshot (current committed version, or
    the bootstrap parquet before the first batch). The reserved
    ``__cdc_seq`` bookkeeping column is dropped unless
    ``with_seq=True``."""
    vs = _vstate(spark, snapshot_path)
    df = _read_current(spark, vs, vs.current())
    if with_seq or SEQ_STATE_COL not in df.columns:
        return df
    return df.drop(SEQ_STATE_COL)


def _last_marker(vs: VersionedState, version: Optional[int]) -> dict:
    """The current version's commit record. Strict on read errors
    (a transient failure must not read as "different batch" and
    re-apply); tolerant only of a non-JSON body (old formats)."""
    if version is None:
        return {}
    try:
        return json.loads(vs.read_marker(version))
    except ValueError:
        return {}


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
    meta_cols=None,
):
    """Start a streaming query that folds ``changes`` into the parquet
    snapshot at ``snapshot_path``.

    ``changes`` must be a streaming DataFrame carrying the key
    columns, ``op_col`` ('I'/'U'/'D', plus 'M' metadata-only ops when
    ``meta_cols=[...]`` names the re-graded columns — see
    :func:`~parq_tools_spark.operators.merge.apply_cdc`; a log
    carrying 'M' without ``meta_cols`` fails the batch loudly rather
    than NULLing content columns) and ``seq_col``. The snapshot
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
        spark = batch_df.sparkSession
        vs = _vstate(spark, snapshot_path)
        ckpt = StateFS(spark, checkpoint_dir).qualify(checkpoint_dir)
        cur = vs.current()
        marker = _last_marker(vs, cur)
        if marker.get("checkpoint") == ckpt and marker.get("batch") == batch_id:
            return  # replay of an already-committed batch
        vs.clean_stale(cur, sweep_root_files=True)
        snapshot = _read_current(spark, vs, cur)
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
            meta_cols=meta_cols,
        )
        nxt = (cur or 0) + 1
        # the write materializes into a FRESH directory while the plan
        # lazily reads the current version's files — which stay put
        # until swept a batch later, so readers never see a gap
        updated.write.mode("overwrite").parquet(vs.version_dir(nxt))
        vs.commit(  # commit point (atomic per scheme — statefs)
            nxt, json.dumps({"batch": batch_id, "checkpoint": ckpt})
        )

    writer = (
        changes.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
