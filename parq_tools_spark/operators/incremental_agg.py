"""Incremental aggregate maintenance — rollup tables over append-only
parquet (beyond-reference; the reference recomputes everything per
run, `parq_tools` has no materialization story at all).

At 100 TB an append-mostly fact table cannot re-scan history to
refresh a summary: the rollup must fold in ONLY the newly-arrived
files. This module maintains a state directory holding mergeable
partial aggregates (sum / count / min / max — avg derives from
sum+count at read time) keyed by the group columns:

- **discovery** is a file listing diffed against a manifest — no data
  read decides what's new. The listing goes through the Hadoop
  ``FileSystem`` API (:class:`~parq_tools_spark.sources.statefs.StateFS`),
  so the same code lists ``file:`` in tests and ``s3a:``/``hdfs:`` on
  a cluster;
- **fold** reads just the new files, partial-aggregates them
  (map-side combine; the shuffle carries one row per group per
  partition), and merges with the state via a second tiny groupBy —
  state size is O(groups), never O(rows);
- **commit** is a VERSIONED-MANIFEST protocol that never renames a
  directory (object stores have no atomic rename): each fold writes a
  fresh ``v=<n>/data`` directory, then writes ``v=<n>/_manifest.json``
  LAST. The manifest's appearance is the commit point — written via
  tmp+atomic-rename on ``file:``/``hdfs:`` and a single atomic PUT on
  object stores — so every reader sees either version n-1 or version
  n, never a torn state. The manifest lives INSIDE the version it
  commits, so processed-file bookkeeping and aggregate data commit
  atomically together: a crash can never double-count or drop a file.
  Versions older than the previous one are deleted at the start of
  the next fold (in-flight readers of the prior version get a full
  fold cycle to finish); a version directory without its manifest is
  an aborted fold and is cleaned the same way. Single writer assumed
  (one maintenance job per state path — the usual scheduler contract).

The partial columns are plain sums/counts/mins/maxes, so the final
state provably equals a flat GROUP BY over all input — which is
exactly how the `incremental_revenue` registry oracle checks it.
"""

from __future__ import annotations

import json
import re
from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parq_tools_spark.sources.statefs import StateFS, VersionedState

__all__ = [
    "incremental_aggregate",
    "read_aggregate",
    "read_aggregate_with_tail",
    "finalize_aggregate",
    "list_versions",
]

# binary state⊕partial merges (the fold combines exactly two rows per
# group, so scalar two-arg forms suffice — which is what admits KLL,
# whose merge has no aggregate form). null handling: an absent side
# (group only in state, or only in the new batch) passes the other
# side through.
def _merge_two(fn: str, a, b):
    if fn in ("sum", "count"):
        # explicit absent-side passthrough; NOT coalesce(a+b, a, b),
        # which would conflate "one side absent" with "a+b overflowed
        # to NULL" (non-ANSI mode) and silently drop a batch
        return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)
    if fn == "min":
        return F.least(a, b)  # least/greatest skip nulls
    if fn == "max":
        return F.greatest(a, b)
    if fn == "approx_distinct":
        # HLL union of per-batch sketches estimates EXACTLY what a
        # one-shot sketch would (union is commutative/associative)
        return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
            F.hll_union(a, b)
        )
    if fn == "quantiles":
        return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
            F.kll_sketch_merge_double(a, b)
        )
    raise ValueError(f"unmergeable fn {fn!r}")
_PARTIAL_FN = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "approx_distinct": F.hll_sketch_agg,
    # KLL quantile sketches (DataSketches): mergeable medians/p99s —
    # the classically un-rollable measure. Binary-merged at state
    # fold time (kll_sketch_merge_double has no aggregate form).
    "quantiles": lambda c: F.kll_sketch_agg_double(c.cast("double")),
}
_DATA = "data"
_MANIFEST = "_manifest.json"


def _normalize_measures(measures: Sequence) -> list:
    out = []
    for m in measures:
        fn, col, cast = (m if len(m) == 3 else (*m, None))
        if fn not in _PARTIAL_FN:
            raise ValueError(
                f"measure fn {fn!r} not mergeable (use "
                f"{sorted(_PARTIAL_FN)}; avg derives from sum+count)"
            )
        out.append((fn, col, cast))
    return out


def _measure_alias(fn: str, col: str) -> str:
    return f"{col}_{fn}"


# ------------------------------------------------- version protocol
# (VersionedState in sources/statefs.py — shared with streaming/cdc;
# the manifest file doubles as the commit marker.)
def _resolve_state(
    spark: SparkSession, state_path: str
) -> Tuple[VersionedState, Optional[int], Optional[DataFrame], set]:
    """Current committed state: ``(vs, version, state_df, done_files)``.

    Manifest reads are STRICT (a committed version's manifest failing
    to read raises) — treating a transient storage error as "no
    manifest" would re-fold every historical file into the existing
    state and commit permanent double counts.

    A legacy pre-versioned layout (root ``data/`` + ``_manifest.json``
    written by the two-rename protocol this module used before the
    versioned one) is resolved as the current state with its manifest
    honored, so an upgrade never re-folds (or silently drops) history;
    the first post-upgrade fold commits ``v=1`` and later folds sweep
    the root files."""
    vs = VersionedState(spark, state_path, _MANIFEST)
    cur = vs.current()
    if cur is not None:
        state = spark.read.parquet(f"{vs.version_dir(cur)}/{_DATA}")
        done = set(json.loads(vs.read_marker(cur))["files"])
        return vs, cur, state, done
    legacy_data = f"{state_path}/{_DATA}"
    if vs.fs.exists(f"{state_path}/{_MANIFEST}"):
        state = spark.read.parquet(legacy_data)
        done = set(
            json.loads(vs.fs.read_text(f"{state_path}/{_MANIFEST}"))["files"]
        )
        return vs, None, state, done
    return vs, None, None, set()


def _sweep_legacy(
    vs: VersionedState, state_path: str, cur: Optional[int]
) -> None:
    """Drop the migrated-from legacy root files once a versioned
    commit exists: legacy became "previous" at v=1's commit, so by
    the NEXT fold's start it has had the same full-cycle reader grace
    every superseded version gets (and it is invisible to version
    resolution either way). ``cur`` is the already-resolved current
    version; the common no-legacy path costs one exists() probe."""
    if cur is not None and vs.fs.exists(f"{state_path}/{_MANIFEST}"):
        vs.fs.delete(f"{state_path}/{_DATA}")
        vs.fs.delete(f"{state_path}/{_MANIFEST}")


def _partial_aggs(measures: Sequence) -> list:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for fn, col, cast in measures:
        c = F.col(col).cast(cast) if cast else F.col(col)
        agg = _stabilize(fn, cast, _PARTIAL_FN[fn](c))
        aggs.append(agg.alias(_measure_alias(fn, col)))
    return aggs


def _merge_state_partial(
    state: DataFrame, partial: DataFrame, keys: Sequence[str], measures
) -> DataFrame:
    """Full-outer join on the group keys, per-measure binary merge.
    One shuffle of two O(groups) frames (broadcastable when small).

    The join is NULL-SAFE on every key (``<=>``): a NULL group key is
    a legal group (``GROUP BY`` treats all NULLs as one group), so a
    plain-equality join would never match it and each fold would
    append a fresh NULL-key row instead of merging — breaking the
    fold == flat-GROUP-BY contract."""
    s, p = state.alias("__s"), partial.alias("__p")
    cond = None
    for k in keys:
        c = F.col(f"__s.{k}").eqNullSafe(F.col(f"__p.{k}"))
        cond = c if cond is None else cond & c
    joined = s.join(p, on=cond, how="full_outer")
    cols = [
        F.coalesce(F.col(f"__s.{k}"), F.col(f"__p.{k}")).alias(k)
        for k in keys
    ]
    cols.append(
        (
            F.coalesce(F.col("__s.n_rows"), F.lit(0))
            + F.coalesce(F.col("__p.n_rows"), F.lit(0))
        ).alias("n_rows")
    )
    for fn, col, cast in measures:
        a = _measure_alias(fn, col)
        merged = _merge_two(fn, F.col(f"__s.{a}"), F.col(f"__p.{a}"))
        merged = _stabilize(fn, cast, merged)
        cols.append(merged.alias(a))
    return joined.select(*cols)


_DECIMAL_RE = re.compile(r"decimal\s*\(\s*\d+\s*,\s*(\d+)\s*\)", re.I)


def _stabilize(fn: str, cast, expr):
    """Pin decimal sums to decimal(38, s): addition widens precision
    by one per fold otherwise, drifting the state schema until the
    38 cap. ``cast`` may be a type string or a DataType (both are
    legal for ``Column.cast``)."""
    if fn != "sum" or cast is None:
        return expr
    scale = None
    if isinstance(cast, str):
        m = _DECIMAL_RE.match(cast.strip())
        scale = m.group(1) if m else None
    elif hasattr(cast, "scale"):  # pyspark DecimalType
        scale = cast.scale
    return expr.cast(f"decimal(38,{scale})") if scale is not None else expr


def list_versions(spark: SparkSession, state_path: str) -> list:
    """Committed version numbers at ``state_path``, ascending. More
    than one exists only when folds ran with ``keep_versions > 1``
    (version travel) — pass one of these to
    :func:`read_aggregate`'s ``version=``."""
    vs = VersionedState(spark, state_path, _MANIFEST)
    return [n for n, ok in vs.versions() if ok]


def read_aggregate(
    spark: SparkSession,
    state_path: str,
    version: Optional[int] = None,
) -> Optional[DataFrame]:
    """The current committed rollup state (partial-aggregate
    columns), or None before the first fold. Resolution = highest
    version whose manifest exists (legacy pre-versioned layouts
    resolve too); aborted folds are invisible.

    ``version=`` reads a specific RETAINED commit instead (fold with
    ``keep_versions > 1`` to retain history): the state exactly as of
    that fold — rollback and as-of auditing without replay. Raises
    for a version that is absent, swept, or uncommitted."""
    if version is not None:
        vs = VersionedState(spark, state_path, _MANIFEST)
        if not vs.fs.exists(vs.marker_path(version)):
            raise ValueError(
                f"version {version} not committed/retained at "
                f"{state_path} (available: "
                f"{list_versions(spark, state_path)})"
            )
        return spark.read.parquet(f"{vs.version_dir(version)}/{_DATA}")
    _, _, state, _ = _resolve_state(spark, state_path)
    return state


def incremental_aggregate(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    keys: Sequence[str],
    measures: Sequence,
    retain=None,
    keep_versions: int = 1,
) -> DataFrame:
    """Fold newly-arrived parquet files under ``input_path`` into the
    rollup state at ``state_path`` and return the updated state.

    ``keep_versions``: how many committed versions to retain (default
    1 = current only, plus the protocol's one-cycle reader grace for
    its predecessor). Larger values keep a rolling history readable
    via :func:`read_aggregate`'s ``version=`` — as-of auditing and
    rollback at the cost of O(groups) storage per retained version.

    ``measures``: ``(fn, col)`` or ``(fn, col, cast)`` tuples with
    ``fn`` in sum/count/min/max/approx_distinct/quantiles; ``cast``
    (e.g. ``"decimal(27,2)"``) applies before aggregation — the way
    to keep money sums exact and partition-order independent. Output
    columns: the keys, ``n_rows`` (group row count) and one
    ``<col>_<fn>`` per measure.

    ``retain``: optional retention predicate over the STATE schema (a
    ``Column`` or SQL string, e.g. ``"ship_month >= '1995-01'"``) —
    groups failing it are dropped at fold time, bounding state size
    when a group key contains a time bucket (otherwise state grows
    monotonically forever). Retention assumes pruned groups receive
    no further input rows (the watermark contract): a late row for a
    pruned group would resurrect it with only the late data. Under
    that assumption, fold+retain provably equals a flat GROUP BY over
    the retained groups' rows.

    Files already named in the manifest are skipped; files must be
    immutable once written (the append-only contract — rewrites are
    invisible to the diff). A run with no new files returns the state
    unchanged without reading any data (retention too is only applied
    when a fold commits).
    """
    keys = list(keys)
    measures = _normalize_measures(measures)
    vs, cur, state, done = _resolve_state(spark, state_path)
    vs.clean_stale(cur, keep_versions=keep_versions)
    _sweep_legacy(vs, state_path, cur)

    in_fs = StateFS(spark, input_path)
    all_files = in_fs.list_files(input_path)
    new = [f for f in all_files if f not in done]
    if not new:
        if state is None:
            raise ValueError(
                f"no parquet files under {input_path} and no existing state"
            )
        return state

    batch = spark.read.parquet(
        *[f"{input_path.rstrip('/')}/{f}" for f in new]
    )
    partial = batch.groupBy(*keys).agg(*_partial_aggs(measures))
    if state is not None:
        merged = _merge_state_partial(state, partial, keys, measures)
    else:
        merged = partial
    if retain is not None:
        merged = merged.filter(
            retain if isinstance(retain, Column) else F.expr(retain)
        )

    nxt = (cur or 0) + 1
    vdir = vs.version_dir(nxt)
    # a fresh directory per fold: the merge plan lazily reads the
    # current version's files, which stay untouched until the NEXT
    # fold's cleanup — no self-overwrite, no reader-visible gap
    merged.write.mode("overwrite").parquet(f"{vdir}/{_DATA}")
    vs.commit(  # the commit point (atomic per scheme — statefs)
        nxt,
        json.dumps({"version": nxt, "files": sorted(done | set(new))}),
    )
    return spark.read.parquet(f"{vdir}/{_DATA}")


def read_aggregate_with_tail(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    keys: Sequence[str],
    measures: Sequence,
) -> DataFrame:
    """Exact up-to-now rollup WITHOUT committing state: the persisted
    state merged with a live partial over files the manifest hasn't
    folded yet (the lambda-architecture read). Costs a listing diff +
    a scan of just the unfolded tail — the folded history is one
    O(groups) state read. Use this for freshness between scheduled
    :func:`incremental_aggregate` folds; the state on disk is
    untouched."""
    keys = list(keys)
    measures = _normalize_measures(measures)
    _, _, state, done = _resolve_state(spark, state_path)
    in_fs = StateFS(spark, input_path)
    new = [f for f in in_fs.list_files(input_path) if f not in done]
    if not new:
        if state is None:
            raise ValueError(
                f"no parquet files under {input_path} and no existing state"
            )
        return state
    tail = (
        spark.read.parquet(
            *[f"{input_path.rstrip('/')}/{f}" for f in new]
        )
        .groupBy(*keys)
        .agg(*_partial_aggs(measures))
    )
    if state is None:
        return tail
    return _merge_state_partial(state, tail, keys, measures)


def finalize_aggregate(
    state: DataFrame,
    averages: Sequence[str] = (),
    distinct_counts: Sequence[str] = (),
    quantiles: Optional[dict] = None,
) -> DataFrame:
    """Derive presentation columns from the mergeable state:
    ``<col>_avg = <col>_sum / <col>_count`` (double) for each name in
    ``averages`` — both partials must be among the measures — and
    ``<col>_distinct_est`` (long) from the HLL sketch for each name in
    ``distinct_counts`` (needs an ``('approx_distinct', col)``
    measure) and ``<col>_q<p>`` quantile estimates from the KLL
    sketch for ``quantiles={col: [0.5, 0.99]}`` (needs a
    ``('quantiles', col)`` measure; fractional percents keep their
    digits — 0.994 -> ``<col>_q99_4`` — so nearby probabilities never
    collide). Raw sketch columns stay in the
    state for future merges; only estimates are derived here."""
    out = state
    for col, probs in (quantiles or {}).items():
        sk = _measure_alias("quantiles", col)
        if sk not in state.columns:
            raise ValueError(
                f"quantiles({col}) needs a ('quantiles', {col!r}) "
                "measure in the state"
            )
        for q in probs:
            label = ("%g" % (q * 100)).replace(".", "_")
            out = out.withColumn(
                f"{col}_q{label}",
                F.kll_sketch_get_quantile_double(F.col(sk), F.lit(float(q))),
            )
    for col in distinct_counts:
        sk = _measure_alias("approx_distinct", col)
        if sk not in state.columns:
            raise ValueError(
                f"distinct_est({col}) needs an ('approx_distinct', "
                f"{col!r}) measure in the state"
            )
        out = out.withColumn(
            f"{col}_distinct_est", F.hll_sketch_estimate(F.col(sk))
        )
    for col in averages:
        s, c = f"{col}_sum", f"{col}_count"
        if s not in state.columns or c not in state.columns:
            raise ValueError(
                f"avg({col}) needs both ('sum', {col!r}) and "
                f"('count', {col!r}) measures in the state"
            )
        out = out.withColumn(
            f"{col}_avg", F.col(s).cast("double") / F.col(c)
        )
    return out
