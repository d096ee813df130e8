"""Streaming maintenance of the persisted BM25 index: a CDC stream
(``op`` in 'I'/'U'/'D') keeps the search index continuously fresh
(beyond-reference; the reference has neither a streaming surface nor a
search index).

Why ``foreachBatch`` + the on-disk index instead of streaming state:
the index IS the state — hundreds of GB of postings at 100 TB of
corpus, living in the versioned-manifest protocol so batch jobs and
serving queries share it. Each micro-batch reuses the exact batch
primitive (:func:`~parq_tools_spark.operators.search.
bm25_index_apply_cdc`): last-op-per-id resolution, version-scoped
tombstones for deletes, O(batch) upserts with no compaction in
between.

Recovery contract (foreachBatch is at-least-once):

- the checkpoint-scoped versioned markers of ``streaming/_markers.py``
  short-circuit fully-applied batches — the exactly-once fast path;
- a lost-marker replay (fresh checkpoint over an already-fed index)
  still CONVERGES: re-applying a CDC batch is final-state idempotent —
  an upsert of an id that already carries that text tombstones and
  re-adds the identical rows, a delete of an already-deleted id is the
  documented no-op. The cost of a replay is extra segment/tombstone
  churn (folded by compaction), never wrong state;
- a crash mid-apply leaves the index at some committed version with
  the half-applied batch's data as an invisible orphan — the next run
  re-applies the whole batch (no marker was committed).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from parq_tools_spark.streaming._markers import (
    commit_marker as _commit_marker,
    last_applied as _last_applied,
)

__all__ = ["start_bm25_index_stream"]


def start_bm25_index_stream(
    changes: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    op_col: str = "op",
    seq_col: Optional[str] = None,
    n_buckets: int = 32,
    store_positions: bool = False,
    keep_versions: int = 1,
    compact_every: int = 0,
    available_now: bool = True,
    query_name: Optional[str] = None,
):
    """Start a streaming query folding CDC rows into the BM25 index.

    If ``index_path`` holds an existing index
    (:func:`~parq_tools_spark.operators.search.bm25_index_build`), its
    stored parameters govern and the stream maintains that corpus from
    the first batch (``id_col``..``keep_versions`` are ignored).
    Otherwise the first batch bootstraps an EMPTY index with the given
    parameters — committed manifest, zero postings — so every batch,
    including the first, takes the one ``bm25_index_apply_cdc`` path
    (the bootstrap gate is the committed manifest, the same reasoning
    as the near-dedup stream's).

    ``compact_every=N`` runs
    :func:`~parq_tools_spark.operators.search.bm25_index_compact`
    after every Nth batch, folding accumulated segments and tombstones
    so steady-state query cost doesn't creep with batch count.
    ``available_now=True`` drains the backlog and stops (the testing /
    catch-up trigger); pass ``False`` for continuous.

    Returns the started ``StreamingQuery``. Query the index at any
    time with :func:`~parq_tools_spark.operators.search.
    bm25_index_topk` — readers always see some fully-committed
    version, never a torn batch.
    """
    if not changes.isStreaming:
        raise ValueError(
            "start_bm25_index_stream needs a streaming DataFrame; use "
            "operators.search.bm25_index_apply_cdc for batch CDC"
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from parq_tools_spark.operators.search import (
            bm25_index_apply_cdc,
            bm25_index_build,
            bm25_index_compact,
        )
        from parq_tools_spark.operators.search import _bm25_vs

        spark = batch_df.sparkSession
        if batch_id <= _last_applied(spark, index_path, checkpoint_dir):
            return  # replay of a batch this query already applied
        if not batch_df.take(1):
            _commit_marker(spark, index_path, checkpoint_dir, batch_id)
            return
        if _bm25_vs(spark, index_path).current() is None:
            bm25_index_build(
                batch_df.limit(0).select(id_col, text_col),
                index_path,
                id_col=id_col,
                text_col=text_col,
                n_buckets=n_buckets,
                store_positions=store_positions,
                keep_versions=keep_versions,
            )
        bm25_index_apply_cdc(
            spark,
            index_path,
            batch_df,
            op_col=op_col,
            seq_col=seq_col,
        )
        # compaction BEFORE the marker (unlike the near-dedup stream,
        # which treats compaction as best-effort after its marker): a
        # compaction crash here fails the batch un-marked, so the
        # restart re-applies the CDC batch (final-state idempotent,
        # only segment churn) and RETRIES the compaction — marker-first
        # would permanently skip this trigger's fold on a crash, and
        # unlike the near-dedup replay, the retry costs no duplicate
        # rows.
        if compact_every and (batch_id + 1) % compact_every == 0:
            bm25_index_compact(spark, index_path)
        _commit_marker(spark, index_path, checkpoint_dir, batch_id)

    writer = changes.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
