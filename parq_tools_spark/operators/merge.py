"""Keyed merge / upsert / CDC-apply (Delta-MERGE semantics, Spark-first).

Beyond-reference operators: a 100 TB training-data lake needs
incremental maintenance — nightly document refreshes, takedown
deletes, metadata backfills — and the reference's whole-file rewrite
model (``parq_concat``-then-replace) has no keyed path. These
implement the standard MERGE INTO contract as pure DataFrame joins so
they run against plain parquet (and compose with
``sources/table_format.py``'s Delta/Iceberg sinks when a connector is
present).

Scale shape: one full-outer shuffle join keyed by the merge keys —
the minimum any keyed merge pays. When the change set is small
relative to the target (the common CDC case), pass
``broadcast_source=True`` to keep the 100 TB side unshuffled; the
matched-key rewrite then rides a map-side broadcast join. AQE handles
skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_upsert", "apply_cdc"]


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Optional[Sequence[str]] = None,
    delete_col: Optional[str] = None,
    broadcast_source: bool = False,
    match_condition: Optional[str] = None,
) -> DataFrame:
    """MERGE INTO target USING source ON keys:

    - matched rows take the source's values (all non-key columns, or
      just ``update_cols`` with the rest kept from the target);
    - unmatched source rows are inserted;
    - unmatched target rows are kept;
    - when ``delete_col`` names a boolean source column, matched rows
      with it true are deleted (and unmatched deletes are no-ops);
    - ``match_condition`` is Delta's ``WHEN MATCHED AND <cond>``: a SQL
      boolean over the ``t``/``s`` aliases (e.g. ``"s.seq > t.seq"``).
      A matched row failing the condition is kept unchanged — its
      update AND delete are both skipped. Inserts are unconditional
      (the condition only ever sees matched pairs).

    Schemas must agree on the non-key columns being written; extra
    target columns are preserved (NULL-filled for inserts only if
    listed in neither ``keys`` nor the source schema). Source keys
    must be unique (the standard MERGE precondition — multiple source
    matches for one target row make the result ambiguous);
    :func:`apply_cdc` guarantees this via its latest-wins pass.

    Two physical shapes:

    - default: ONE full-outer shuffle join on the keys — the right
      plan when the change set is comparable to the target;
    - ``broadcast_source=True``: a full outer join cannot build a
      broadcast side, so the merge is decomposed into (a) a broadcast
      LEFT join applying updates/deletes to the target — map-only,
      the 100 TB side never shuffles — plus (b) the insert set from a
      key-pruned broadcast semi scan of the target (filters/column
      pruning reach the parquet footer, so pass (b) reads only the
      key column). Two target scans, zero target shuffles — the
      difference between a metadata-rate operation and a corpus
      rewrite when changes are small.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    missing = [k for k in keys if k not in source.columns or k not in target.columns]
    if missing:
        raise ValueError(f"key columns missing from target/source: {missing}")

    t_cols = [c for c in target.columns if c not in keys]
    s_cols = [c for c in source.columns if c not in keys and c != delete_col]
    if update_cols is None:
        update_cols = [c for c in s_cols if c in t_cols]
    bad = [c for c in update_cols if c not in s_cols]
    if bad:
        raise ValueError(f"update_cols not in source: {bad}")
    ghost = [c for c in update_cols if c not in t_cols]
    if ghost:
        # the output schema is the TARGET schema; an update column the
        # target lacks would be silently dropped otherwise
        raise ValueError(f"update_cols not in target: {ghost}")

    if broadcast_source:
        return _merge_broadcast(
            target, source, keys, list(update_cols), delete_col,
            match_condition,
        )

    # row provenance: the key columns are coalesced by the USING join,
    # so probe a guaranteed-non-null marker from each side instead
    joined = (
        target.withColumn("_t_present", F.lit(True))
        .alias("t")
        .join(
            source.withColumn("_s_present", F.lit(True)).alias("s"),
            on=keys,
            how="full_outer",
        )
    )
    matched = F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
    if match_condition is not None:
        # null condition result means "not satisfied", per WHEN MATCHED AND
        matched = matched & F.coalesce(F.expr(match_condition), F.lit(False))
    insert = F.col("_t_present").isNull()
    deleted = (
        F.col(f"s.{delete_col}").isNotNull() & F.col(f"s.{delete_col}")
        if delete_col
        else F.lit(False)
    )

    out_cols = [F.col(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        if c in update_cols:
            val = (
                F.when(matched | insert, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
            )
        elif c in source.columns and c != delete_col:
            # not updated on match, but inserts still need the value
            val = F.when(insert, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            val = F.col(f"t.{c}")
        out_cols.append(val.alias(c))

    return joined.filter(~(deleted & (matched | insert))).select(*out_cols)


def _merge_broadcast(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str],
    delete_col: Optional[str],
    match_condition: Optional[str] = None,
) -> DataFrame:
    """Small-source merge with zero shuffles of the target: broadcast
    left join for updates/deletes + key-pruned semi scan for inserts.
    Produces exactly the rows the full-outer plan produces."""
    marked = source.withColumn("_s_present", F.lit(True))
    joined = target.alias("t").join(
        F.broadcast(marked).alias("s"), on=keys, how="left"
    )
    matched = F.col("_s_present").isNotNull()
    if match_condition is not None:
        matched = matched & F.coalesce(F.expr(match_condition), F.lit(False))
    deleted = (
        matched & F.col(f"s.{delete_col}").isNotNull() & F.col(f"s.{delete_col}")
        if delete_col
        else F.lit(False)
    )
    upd_cols = [F.col(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        if c in update_cols:
            val = F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
        else:
            val = F.col(f"t.{c}")
        upd_cols.append(val.alias(c))
    updated = joined.filter(~deleted).select(*upd_cols)

    # inserts: source keys absent from the target. The target scan here
    # projects only the key columns (column pruning hits the footer).
    matched_keys = (
        target.select(*keys)
        .join(F.broadcast(source.select(*keys)), on=keys, how="left_semi")
        .distinct()
    )
    ins = source.join(matched_keys, on=keys, how="left_anti")
    if delete_col:
        ins = ins.filter(
            ~(F.col(delete_col).isNotNull() & F.col(delete_col))
        )
    ins_cols = [F.col(k) for k in keys]
    for c in target.columns:
        if c in keys:
            continue
        if c in source.columns and c != delete_col:
            val = F.col(c)
        else:
            val = F.lit(None).cast(target.schema[c].dataType)
        ins_cols.append(val.alias(c))
    return updated.unionByName(ins.select(*ins_cols))


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_source: bool = False,
    target_seq_col: Optional[str] = None,
    meta_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Apply a change-data-capture log to a keyed snapshot.

    ``changes`` carries one row per change event with ``op_col`` in
    {'I','U','D'} (insert/update/delete — I and U are both upserts)
    and ``seq_col`` a monotonically increasing change sequence. For
    each key only the LATEST event applies (max ``seq_col``; ties
    broken by ``op_col`` descending, so a same-sequence U beats D —
    document your log's ordering and pass unique sequences to avoid
    relying on the tiebreak).

    ``meta_cols`` opts into 'M' (metadata-only) ops — the index
    families' convention (``*_index_apply_cdc``), where an 'M' row
    re-grades a subset of columns and carries NULL (meaning "don't
    touch") in every other content column. Without it, a log carrying
    'M' raises LOUDLY instead of upserting those rows — feeding an
    'M' through the plain upsert path would overwrite the row's
    content columns with the NULLs while an index applying the SAME
    log flips only its metadata, silently diverging the two surfaces.
    With ``meta_cols=[...]`` named, an 'M' updates exactly those
    columns and preserves the rest from the snapshot, resolved with
    the index semantics (shared with ``_index_common.
    resolve_cdc_with_meta``): the last 'M' per key applies AFTER the
    batch's upserts, is superseded by a non-'M' op at an
    equal-or-later sequence, and is a no-op when its key is not
    present once the deletes/upserts have applied (never an insert,
    never an error — replay convergence). Ops outside I/U/D/'M' —
    including NULL — always raise. The op validation is one
    early-stopping, column-pruned ``take(1)`` probe over the change
    log per call (a clean log pays a scan of its op column; the same
    per-batch-probe trade the index sinks' ``resolve_cdc_with_meta``
    makes), plus a second such probe for 'M' presence when
    ``meta_cols`` is set — the only eager work here.

    ``target_seq_col`` (stale-event protection): when set, ``target``
    must carry that column holding the seq of the last event applied
    per key (NULL for never-touched rows). An event only applies when
    its seq is STRICTLY greater than the stored value, and the stored
    value advances to the applied event's seq — so replaying an
    already-applied log is a no-op (idempotent at-least-once apply)
    and a late batch carrying stale events cannot overwrite newer
    state. Without it, each call is latest-wins only within the
    ``changes`` it was handed. Caveat: a delete removes the row AND
    its stored seq, so a stale pre-delete upsert arriving later would
    resurrect the key — retain tombstones upstream if your log can
    reorder across a delete.

    Shape: one window pass over the change log keyed by ``keys``
    (the log, not the snapshot), then :func:`merge_upsert` — the
    100 TB snapshot shuffles at most once, or never with
    ``broadcast_source=True``. The seq guard rides the same join as a
    ``match_condition``; it adds no extra pass.
    """
    keys = list(keys)
    meta_cols = list(meta_cols) if meta_cols is not None else None
    allowed = ["I", "U", "D"] + (["M"] if meta_cols else [])
    # NULL must not slip through: ~isin(...) is NULL for a NULL op,
    # which a bare filter would silently drop — the same malformed
    # row would then be applied or discarded depending on meta_cols
    stray = changes.filter(
        ~F.col(op_col).isin(allowed) | F.col(op_col).isNull()
    ).select(op_col).take(1)
    if stray:
        op = stray[0][0]
        if op == "M":
            raise ValueError(
                "apply_cdc: the change log carries 'M' (metadata-only)"
                " ops but meta_cols= was not given — upserting them "
                "would NULL the rows' content columns while an index "
                "applying the same log flips only its metadata. Pass "
                "meta_cols=[...] naming the re-graded columns, or "
                "keep 'M' ops off snapshot logs."
            )
        raise ValueError(
            f"apply_cdc: unknown op {op!r} in {op_col!r} — expected "
            f"one of {allowed}"
        )
    if meta_cols:
        bad = [
            c
            for c in meta_cols
            if c in keys or c in (op_col, seq_col, target_seq_col)
        ]
        if bad:
            # target_seq_col especially: a meta column aliasing the
            # stored-seq column would write the change row's raw seq
            # over the idempotence bookkeeping
            raise ValueError(
                f"apply_cdc: meta_cols {bad} collide with the keys / "
                "op / seq / target_seq columns"
            )
        missing = [
            c
            for c in meta_cols
            if c not in target.columns or c not in changes.columns
        ]
        if missing:
            raise ValueError(
                f"apply_cdc: meta_cols {missing} missing from the "
                "target and/or the change log"
            )
        clash = [
            c
            for c in ["_m_has", "_m_seq"]
            + [f"_m_{c}" for c in meta_cols]
            if c in target.columns
        ]
        if clash:
            # the fold join's helper names: an ambiguous-reference
            # crash at execution is a worse error than this one
            raise ValueError(
                f"apply_cdc: target column(s) {clash} collide with "
                "the 'M'-fold join's helper columns — rename them"
            )

    others = changes.filter(F.col(op_col) != "M") if meta_cols else changes
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        others.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    metas = None
    if meta_cols:
        metas = (
            changes.filter(F.col(op_col) == "M")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if not metas.take(1):
            metas = None  # fast path: a meta-capable log with no M's
        else:
            # a non-M op at an equal-or-later seq supersedes the M:
            # a U carries the full authoritative record, a D removes
            # the row it would touch (resolve_cdc_with_meta semantics).
            # Both sides are change-log-sized; broadcast_source is the
            # caller's statement that the log is small, so the
            # supersession join broadcasts too (otherwise it reuses
            # the window's existing hash partitioning of the log).
            sup = latest.select(
                *keys, F.col(seq_col).alias("_other_seq")
            )
            if broadcast_source:
                sup = F.broadcast(sup)
            metas = (
                metas.join(sup, on=keys, how="left")
                .filter(
                    F.col("_other_seq").isNull()
                    | (F.col(seq_col) > F.col("_other_seq"))
                )
                .drop("_other_seq")
                .select(
                    *keys,
                    F.col(seq_col).alias("_m_seq"),
                    *[F.col(c).alias(f"_m_{c}") for c in meta_cols],
                )
                .withColumn("_m_has", F.lit(True))
            )

    match_condition = None
    if target_seq_col is not None:
        if target_seq_col not in target.columns:
            raise ValueError(
                f"target_seq_col {target_seq_col!r} not in target; "
                "add it (NULL-initialised) before the first apply"
            )
        if target_seq_col != seq_col:
            latest = latest.withColumn(
                target_seq_col, F.col(seq_col)
            ).drop(seq_col)
        match_condition = (
            f"t.`{target_seq_col}` IS NULL "
            f"OR s.`{target_seq_col}` > t.`{target_seq_col}`"
        )
    else:
        latest = latest.drop(seq_col)
    latest = latest.withColumn("_is_delete", F.col(op_col) == "D").drop(op_col)
    base = merge_upsert(
        target,
        latest,
        keys,
        delete_col="_is_delete",
        broadcast_source=broadcast_source,
        match_condition=match_condition,
    )
    if metas is None:
        return base

    # fold surviving M's AFTER the upserts: matched keys re-grade
    # exactly meta_cols (everything else preserved from the row the
    # batch just settled); unmatched M's vanish — no insert, no error
    m_side = F.broadcast(metas) if broadcast_source else metas
    joined = base.join(m_side, on=keys, how="left")
    applied = F.col("_m_has").isNotNull()
    if target_seq_col is not None:
        # the same stale-event guard the upsert leg rides: an M replay
        # at-or-below the stored seq must not re-apply (idempotence),
        # and an applied M advances the stored seq
        applied = applied & (
            F.col(target_seq_col).isNull()
            | (F.col("_m_seq") > F.col(target_seq_col))
        )
    out_cols = []
    for c in base.columns:
        if c in meta_cols:
            out_cols.append(
                F.when(applied, F.col(f"_m_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        elif c == target_seq_col:
            out_cols.append(
                F.when(applied, F.col("_m_seq"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)
