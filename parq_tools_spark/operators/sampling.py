"""Deterministic sampling and dataset splits (beyond-reference).

Training-data pipelines need samples and train/val/test splits that
are (a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) cheap. ``df.sample`` satisfies none of these
(seeded per-partition RNG — changes with partitioning). Instead rows
are assigned by hashing a key column: ``md5(key)`` is bit-identical in
every engine, so the same row always lands in the same
sample/split — and the assignment is auditable with plain SQL.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_sample",
    "hash_split",
    "stratified_sample",
    "weighted_sample",
    "mixture_sample",
    "pack_token_shards",
]

_BUCKETS = 1 << 32


def hash_bucket(key: Column | str) -> Column:
    """Uniform bucket in [0, 2^32) from md5 of the key's string form.

    conv(substr(md5(x),1,8), 16, 10) — the first 8 hex chars as an
    integer. Engine-portable: DuckDB spells it
    ``CAST(('0x' || substr(md5(x),1,8)) AS BIGINT)`` (or from_hex).
    """
    col = F.col(key) if isinstance(key, str) else key
    # null keys hash as the empty string so they are assigned
    # deterministically instead of silently dropped by a null filter
    return F.conv(
        F.substring(F.md5(F.coalesce(col.cast("string"), F.lit(""))), 1, 8),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash.

    Partitioning-independent and engine-reproducible; the same keys are
    selected every run. Map-only — no shuffle, no RNG state.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    # floor, never round: the SQL oracle form is
    # CAST(floor(f * 4294967296) AS BIGINT) — both engines must place a
    # key hashing exactly to the boundary bucket on the same side
    return df.filter(hash_bucket(key) < math.floor(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    key: str,
    weights: Sequence[float],
    split_col: str = "split",
    names: Sequence[str] | None = None,
) -> DataFrame:
    """Label each row with a split name by hash range (train/val/test).

    ``weights`` are fractions summing to <= 1 (any remainder falls in
    the last split). Rows with equal keys always share a split —
    the property that prevents train/test leakage of duplicated keys.
    """
    if any(w < 0 for w in weights) or sum(weights) > 1 + 1e-9:
        raise ValueError("weights must be non-negative and sum to <= 1")
    names = list(names) if names else [f"split_{i}" for i in range(len(weights))]
    if len(names) != len(weights):
        raise ValueError("names and weights must align")
    bucket = hash_bucket(key)
    expr = None
    bound = 0.0
    for name, weight in zip(names[:-1], weights[:-1]):
        bound += weight
        cond = bucket < math.floor(bound * _BUCKETS)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key: str,
) -> DataFrame:
    """Per-stratum deterministic sample (pandas ``groupby().sample``
    analogue, Spark ``sampleBy`` analogue without RNG state).

    Each stratum keeps ~``fractions[stratum]`` of its rows, chosen by
    the key hash — partitioning-independent, reproducible in any
    engine, and leakage-safe (the same key is always in or always out
    for a given fraction). Strata absent from ``fractions`` default to
    0.0 (dropped). Map-only: the stratum thresholds compile to one
    CASE expression; no shuffle, no RNG.
    """
    for stratum, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1]")
    threshold = F.lit(0).cast("long")
    expr = threshold
    for stratum, f in fractions.items():
        expr = F.when(
            F.col(strata_col) == F.lit(stratum),
            F.lit(math.floor(f * _BUCKETS)).cast("long"),
        ).otherwise(expr)
    return df.filter(hash_bucket(key) < expr)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    round_to: int = 9,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: ``n``
    rows where each row's inclusion probability is proportional to
    ``weight_col`` (Efraimidis & Spirakis 2006, the exponential-race
    form): draw ``u`` from the row's key hash, score ``-ln(u) / w``,
    keep the ``n`` smallest scores. The same keys win every run, on
    any partitioning, in any engine — the sampling analogue of
    :func:`deterministic_sample`'s contract, for the common "sample
    documents by length/quality weight" pass.

    Rows with NULL or non-positive weight are excluded (zero weight =
    zero probability; the exponential race is undefined there).
    Returns the surviving rows plus ``sample_score`` (ascending =
    more preferred), rounded to the portable ``1e-round_to`` grid so
    both engines rank identically; exact ties break by ascending key.

    Scale shape: one map-only score projection, then
    ``orderBy().limit(n)`` = TakeOrderedAndProject — each task keeps
    its local n, only n rows per partition reach the merge. No full
    sort, no shuffle of the corpus.
    """
    if n <= 0:
        raise ValueError("n must be positive")
    w = F.col(weight_col).cast("double")
    # u in (0, 1): (bucket + 0.5) / 2^32 — never exactly 0 or 1, so
    # ln is finite; identical spelling in the SQL oracle
    u = (hash_bucket(key).cast("double") + F.lit(0.5)) / F.lit(
        float(_BUCKETS)
    )
    scale = float(10**round_to)
    score = F.floor((-F.log(u) / w) * F.lit(scale) + F.lit(0.5)) / F.lit(
        scale
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("sample_score", score)
        .orderBy(F.col("sample_score").asc(), F.col(key).asc())
        .limit(n)
    )


def pack_token_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_by: Sequence[str] = ("doc_id",),
    shard_col: str = "shard",
    validate_order: bool = False,
) -> DataFrame:
    """Assign documents to fixed token-budget shards (training-corpus
    sharding: "write files of ~N tokens each").

    Deterministic streaming pack in a fixed document order: shard =
    floor(exclusive-running-token-sum / budget). Reproducible across
    runs/engines/partitionings (the order is a column contract, not
    physical order) and auditable in plain SQL. A document longer than
    the budget gets a shard of its own and pushes the next shard
    boundary past itself (no splitting — document integrity beats
    perfect balance for training data).

    ``order_by`` must be a TOTAL (unique) order: rows tied on all the
    order columns get arbitrary relative positions in the running sum,
    so their shard assignments can differ between runs — append a
    unique id as the last order column if the natural key can tie.
    ``validate_order=True`` spends one extra aggregation to fail fast
    on duplicated order keys instead of packing nondeterministically.

    Scale shape: a naive ``Window.orderBy`` with no partition key
    executes in ONE task (Spark warns and moves everything to a single
    partition), so the global prefix sum runs as the classic two-pass
    decomposition instead: range-repartition on the order columns,
    local window cumsum per partition, then one tiny per-partition
    total aggregate (rows = #partitions) joined back as broadcast
    offsets. Every pass is distributed; the only driver-sized data is
    the offset table.
    """
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError("budget must be positive")
    if validate_order:
        dup = (
            df.groupBy(*order_by)
            .agg(F.count(F.lit(1)).alias("__pts_n"))
            .filter(F.col("__pts_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {c: dup[0][c] for c in order_by}
            raise ValueError(
                f"order_by {tuple(order_by)} is not a total order: key "
                f"{key} appears {dup[0]['__pts_n']} times; append a "
                "unique tiebreaker column"
            )
    reserved = {"__pts_pid", "__pts_offset"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with scratch names: {sorted(clash)}")
    order_cols = [F.col(c).asc() for c in order_by]
    tok = F.col(token_col).cast("long")

    # range partitions are contiguous in order_by and numbered in
    # order, so per-partition totals in pid order are prefix offsets
    parted = df.repartitionByRange(*order_cols).withColumn(
        "__pts_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pts_pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local_excl = F.sum(tok).over(w_local) - tok

    w_parts = Window.orderBy("__pts_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        parted.groupBy("__pts_pid")
        .agg(F.sum(tok).alias("__pts_total"))
        # this window IS single-task, over #partitions rows — trivial
        .withColumn("__pts_offset", F.sum("__pts_total").over(w_parts) - F.col("__pts_total"))
        .select("__pts_pid", "__pts_offset")
    )
    return (
        parted.join(F.broadcast(offsets), "__pts_pid")
        .withColumn(
            shard_col,
            F.floor((F.col("__pts_offset") + local_excl) / F.lit(budget)).cast("long"),
        )
        .drop("__pts_pid", "__pts_offset")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict,
    key: str,
) -> DataFrame:
    """Deterministically downsample each source so the result matches
    the target mixture proportions — the corpus-mixing pass of a
    training-data pipeline (e.g. 50% web / 30% books / 20% code).

    No source is upsampled: the binding source (largest observed
    count relative to its weight... strictly, the one minimizing
    ``count/weight``) is kept whole and every other source is
    hash-downsampled to match, so result sizes are
    ``weight_s * min_t(count_t / weight_t)``. Sources absent from
    ``weights`` are dropped.

    Cost at 100 TB: one map-side-partial count on a low-cardinality
    column (tiny collect: one row per source), then the same map-only
    hash filter as :func:`stratified_sample` — no shuffle of the
    data itself, reproducible in any engine. Keep-fractions are
    floored to a 1e-9 grid so the SQL oracle computes bit-identical
    thresholds.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    counts = {
        r[source_col]: r["cnt"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("cnt")).collect()
    }
    ratios = [
        counts[s] / w for s, w in weights.items() if w > 0 and counts.get(s)
    ]
    if not ratios:
        raise ValueError("no weighted source present in the data")
    scale = min(ratios)
    fractions = {}
    for s, w in weights.items():
        c = counts.get(s, 0)
        if c == 0 or w <= 0:
            continue
        f = min(1.0, w * scale / c)
        fractions[s] = math.floor(f * 1e9) / 1e9
    return stratified_sample(df, source_col, fractions, key)
