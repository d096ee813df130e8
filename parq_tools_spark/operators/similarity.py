"""Similarity search over embedding columns (beyond-reference).

Approximate-nearest-neighbor over an ``array<float>`` column:

- brute-force cosine top-k — the exactness baseline. Dot products run
  JVM-side (``zip_with`` + ``aggregate``, whole-stage codegen); the
  query side is broadcast so the corpus never shuffles.
- LSH (random hyperplane / signed random projection) — signature
  buckets bound the candidate set; recall tuned by bands.
- IVF (inverted file) — KMeans coarse quantizer; queries probe the
  ``nprobe`` nearest centroids, so each query scans ~nprobe/ncells of
  the corpus. The scale path for 100 TB: centroid assignment
  partitions/prunes the corpus like a partition key.

Embedding-cosine near-duplicate detection composes these:
candidates from LSH buckets, verified by exact cosine.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The rounding grid every closed-form similarity decision snaps to
# (cosines are floor(x * 10^ROUND + 0.5) / 10^ROUND so Spark, the
# persisted index model, and the DuckDB oracle agree bit-for-bit).
# ann_index_build and the streaming bootstrap both default to THIS
# constant — a change here moves the whole family together instead
# of silently diverging a hand-copied literal.
DEFAULT_ROUND_TO = 6

__all__ = [
    "DEFAULT_ROUND_TO",
    "cosine_similarity_col",
    "ivf_rebalance_subcells",
    "normalize_embeddings",
    "brute_force_topk",
    "brute_force_pairs",
    "ivf_hashseed_topk",
    "brute_force_pairs_blocked",
    "lsh_signatures",
    "lsh_topk",
    "ivf_build",
    "ivf_topk",
    "embedding_near_duplicate_pairs",
    "dedupe_embedding_near_duplicates",
    "adc_score",
    "pq_build",
    "pq_encode",
    "pq_topk",
    "opq_rotation",
    "ivf_pq_topk",
    "semantic_dedupe",
    "pq_codebooks",
    "pq_encode_with_cells",
]


def cosine_similarity_col(a, b):
    """Exact cosine similarity of two array<float/double> columns (JVM-side)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return dot / (na * nb)


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalize the embedding column (cosine becomes dot product)."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return df.withColumn(
        vec_col,
        F.transform(F.col(vec_col), lambda v: v.cast("double") / norm),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x full corpus scan.

    One pass over the corpus regardless of query count; per-query
    ranking via a window partitioned by query id (shuffles only the
    (query, corpus-id, sim) triples, never the vectors).
    Returns (query_id, vec_id, cosine_sim, rank).
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    joined = corpus.alias("c").join(
        F.broadcast(q), F.col("query_id") != F.col(f"c.{id_col}")
    )
    sims = joined.select(
        "query_id",
        F.col(f"c.{id_col}").alias(id_col),
        cosine_similarity_col(F.col(f"c.{vec_col}"), F.col("_qvec")).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------- LSH
def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: Optional[int] = None,
    out_col: str = "lsh_sig",
) -> DataFrame:
    """Signed-random-projection signature: one int with n_planes bits.

    One numpy matmul per Arrow batch against the broadcast plane
    matrix (map-only, no shuffle). The rounds-1-4 formulation built
    n_planes interpreted ``aggregate``-over-``zip_with`` expressions
    per row — Catalyst does not codegen HOFs, and that ladder was the
    same constant-factor trap the IVF assignment had. Sign bits are
    identical: the dot products differ from the expression left-fold
    only in float summation order, and a flipped sign needs
    |dot| < ~1e-13 — the DuckDB oracle (which also re-sums in its own
    order) has always carried that same epsilon and hash-matches.
    """
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("empty corpus: cannot infer embedding dimension")
        dim = len(first[0])
    import pandas as pd

    from pyspark.sql import types as T

    planes = np.asarray(_hyperplanes(dim, n_planes, seed), dtype=np.float64)
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    bc = df.sparkSession.sparkContext.broadcast((planes, weights))
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches):
        pl, w = bc.value
        for b in batches:
            out = b[cols].copy()
            if not len(b):
                out[out_col] = np.array([], dtype=np.int64)
                yield out
                continue
            vecs = b[vec_col].to_numpy()
            # np.stack on null / ragged rows dies with an opaque
            # executor error — reject them with the offending rows
            # named instead (the expression-based predecessor silently
            # produced sign-bit-0 garbage for nulls, which was worse)
            lengths = np.fromiter(
                (-1 if v is None else len(v) for v in vecs),
                dtype=np.int64,
                count=len(vecs),
            )
            bad = np.nonzero(lengths != pl.shape[1])[0]
            if len(bad):
                id_cols = [c for c in cols if c != vec_col]
                sample = b.iloc[bad[:3]][id_cols].to_dict("records")
                raise ValueError(
                    f"lsh_signatures: {len(bad)} row(s) have a null or "
                    f"wrong-length {vec_col!r} (expected dim "
                    f"{pl.shape[1]}, got "
                    f"{sorted(set(lengths[bad].tolist()))[:5]} where -1 "
                    f"is null); first offending rows: {sample}. Filter "
                    f"or fix these before hashing."
                )
            mat = np.stack(vecs).astype(np.float64)
            dots = mat @ pl.T
            out[out_col] = ((dots > 0).astype(np.int64) * w[None, :]).sum(
                axis=1
            )
            yield out

    return df.mapInPandas(run, schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """ANN top-k: candidates share at least one LSH signature band.

    Bands of the signature are the bucket keys; a query only scores
    corpus vectors colliding in >= 1 band (recall grows with bands,
    cost with bucket size). Returns (query_id, vec_id, cosine_sim,
    rank) like the brute-force baseline.
    """
    query_id_col = query_id_col or id_col
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[0])
    width = n_planes // n_bands
    mask = (1 << width) - 1

    def banded(df: DataFrame, idc: str, alias_id: str) -> DataFrame:
        sigs = lsh_signatures(df, vec_col, n_planes, seed, dim)
        return sigs.select(
            F.col(idc).alias(alias_id),
            F.col(vec_col).alias(f"{alias_id}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.shiftright("lsh_sig", bi * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("bval"),
                        )
                        for bi in range(n_bands)
                    ]
                )
            ).alias("bk"),
        ).select(alias_id, f"{alias_id}_vec", "bk.band", "bk.bval")

    cband = banded(corpus, id_col, "cid")
    qband = banded(queries, query_id_col, "query_id")
    cand = (
        cband.join(
            F.broadcast(qband),
            (cband.band == qband.band)
            & (cband.bval == qband.bval)
            & (F.col("cid") != F.col("query_id")),
        )
        .select("query_id", "query_id_vec", "cid", "cid_vec")
        .dropDuplicates(["query_id", "cid"])
    )
    sims = cand.select(
        "query_id",
        F.col("cid").alias(id_col),
        cosine_similarity_col("cid_vec", "query_id_vec").alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------------- IVF
def ivf_build(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """Train the coarse quantizer and assign corpus vectors to cells.

    Returns (assigned_corpus_df, centroids) where assigned rows carry a
    ``cell`` column. Uses pyspark.ml KMeans (distributed Lloyd's).
    At scale, write the assigned corpus partitioned by ``cell`` so a
    probe reads only the probed partitions (partition pruning).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = corpus.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter, featuresCol="_features").fit(
        feat
    )
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "cell")
        .drop("_features")
    )
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_rebalance_subcells(
    assigned_corpus: DataFrame,
    max_cell_rows: int,
    id_col: str = "vec_id",
    subcell_col: str = "subcell",
) -> DataFrame:
    """Split skewed IVF cells into bounded sub-cells for balanced layout.

    KMeans tolerates arbitrarily skewed cells (a degenerate corpus can
    put most vectors in one cell), which at scale means one straggler
    write task and one huge partition directory. This adds a
    ``subcell`` column: cells at or under ``max_cell_rows`` keep
    subcell 0; a hot cell with s rows hash-splits into ceil(s /
    max_cell_rows) sub-cells by the id hash — deterministic,
    partitioning-independent, and strict about EXPECTED size (hash
    variance can overshoot a little; the bound is s/k per sub-cell on
    average).

    Search semantics are untouched: ``cell`` remains the centroid id,
    probes rank and filter exactly as before, so every oracle result
    is bit-identical. Only the physical layout changes — a
    (cell, subcell)-partitioned write keeps partition pruning on
    ``cell`` skipping unprobed data while no single directory holds
    an unbounded cell.
    """
    if max_cell_rows <= 0:
        raise ValueError("max_cell_rows must be positive")
    sizes = assigned_corpus.groupBy("cell").agg(
        F.count(F.lit(1)).alias("_n")
    ).collect()
    n_sub = {
        r["cell"]: max(1, -(-r["_n"] // max_cell_rows)) for r in sizes
    }
    expr = F.lit(0)
    for cell_id, k in n_sub.items():
        if k > 1:
            expr = F.when(
                F.col("cell") == F.lit(cell_id),
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(k)).cast("int"),
            ).otherwise(expr)
    return assigned_corpus.withColumn(subcell_col, expr.cast("int"))


# ivf_write / ivf_read (the one-shot unversioned cell-partitioned
# layout) were removed after a deprecation cycle: the versioned
# ann_index_build / ann_index_topk family (operators/ann_index.py)
# serves the same cell-pruned shape crash-safely, incrementally,
# and with retention. See MIGRATION.md.
def ivf_topk(
    assigned_corpus: DataFrame,
    centroids: list,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells per query, exact-rank inside.

    Driver computes each query's probe list against the (tiny)
    centroid table? No — queries stay distributed: cell distances are
    JVM expressions over the broadcast-inlined centroid literals, and
    the probe set is the top-nprobe cells by dot product. The corpus
    side is filtered by cell before any similarity is computed.
    """
    query_id_col = query_id_col or id_col
    cent_arr = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    # per query: indices of the nprobe nearest centroids
    dists = F.transform(
        cent_arr,
        lambda c: F.aggregate(
            F.zip_with(F.col(vec_col), c, lambda v, cc: v.cast("double") * cc),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    n_cells = len(centroids)
    indexed = F.transform(
        F.sequence(F.lit(0), F.lit(n_cells - 1)),
        lambda i: F.struct(
            F.element_at(F.col("_cell_sims"), i + 1).alias("sim"), i.alias("idx")
        ),
    )
    probe = F.slice(
        F.array_sort(
            indexed,
            lambda x, y: F.when(x.sim > y.sim, -1)
            .when(x.sim < y.sim, 1)
            .otherwise(0),
        ),
        1,
        nprobe,
    )
    q = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            dists.alias("_cell_sims"),
        )
        .withColumn("cell", F.explode(probe))
        .select(
            "query_id", "_qvec", F.col("cell.idx").cast("int").alias("cell")
        )
    )

    cand = assigned_corpus.join(
        F.broadcast(q),
        (assigned_corpus.cell == q.cell)
        & (F.col(id_col) != F.col("query_id")),
    )
    sims = cand.select(
        "query_id",
        F.col(id_col),
        cosine_similarity_col(vec_col, "_qvec").alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_driver_rows: int = 0,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (id1 < id2), vectorized.

    The DEFAULT path (``max_driver_rows=0``) is
    :func:`brute_force_pairs_blocked`: a block-grid decomposition whose
    shuffle and per-task memory are independent of corpus size — it
    never collects the corpus anywhere, so it is safe at any N.

    ``max_driver_rows > 0`` opts in to a small-corpus fast path: if the
    corpus is at most that many rows, its matrix is collected once to
    the driver and broadcast (float64); each partition then computes a
    block of the similarity matrix with one BLAS matmul inside
    ``mapInPandas`` — Arrow batches in, ~memory-bandwidth-bound numpy
    out, no shuffle at all. Corpora above the opt-in cap fall back to
    the blocked path. Results are identical either way (same portable
    floor(x*10^r + 0.5)/10^r rounding, same id1 < id2 contract). For
    genuinely huge corpora prefer
    :func:`embedding_near_duplicate_pairs` (LSH candidates) — the
    O(N^2) compute is the real limit long before memory is.
    """
    import pandas as pd

    from pyspark.sql import types as T

    # limit+count probes the size with an early-exit scan instead of
    # executing the full upstream plan just to choose a dispatch path
    if (
        max_driver_rows <= 0
        or corpus.limit(max_driver_rows + 1).count() > max_driver_rows
    ):
        return brute_force_pairs_blocked(
            corpus,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            round_to=round_to,
        )

    pdf = corpus.select(id_col, vec_col).toPandas()
    if pdf.empty:
        raise ValueError("empty corpus")
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast((ids, mat, norms))
    scale = float(10**round_to)

    out_schema = T.StructType(
        [
            T.StructField("id1", T.LongType()),
            T.StructField("id2", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def block(batches):
        all_ids, all_mat, all_norms = bc.value
        for b in batches:
            bids = b[id_col].to_numpy()
            bmat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            bnorms = np.sqrt((bmat * bmat).sum(axis=1))
            sims = (bmat @ all_mat.T) / (bnorms[:, None] * all_norms[None, :])
            sims = np.floor(sims * scale + 0.5) / scale
            keep = (sims >= threshold) & (bids[:, None] < all_ids[None, :])
            r, c = np.nonzero(keep)
            yield pd.DataFrame(
                {"id1": bids[r], "id2": all_ids[c], "cosine_sim": sims[r, c]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(block, schema=out_schema)


def brute_force_pairs_blocked(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    block_size: int = 8192,
    n_blocks: Optional[int] = None,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold with NO driver-side corpus.

    Block-matrix decomposition of the N x N similarity matrix: vectors
    are hash-assigned to ``n_blocks`` blocks; each grid cell (i, j)
    with i <= j receives block i as its row side and block j as its
    column side via explode-replication (a ``_side`` flag on a single
    union keeps the two roles apart), and a grouped ``applyInPandas``
    computes that cell's block with chunked BLAS matmuls. Every
    unordered pair lands in exactly one cell (the cell keyed by its
    two block ids), so no dedup pass is needed. A side-tagged union
    into one grouped ``applyInPandas`` is used instead of
    ``cogroup(...)`` because the cogroup plan's per-side inputs can be
    column-pruned when the query's action discards the UDF output
    (e.g. ``count()``), which would starve the Python function.

    Scale shape: shuffle is O(N * n_blocks) vector copies (each vector
    joins one row of cells and one column of cells); cell memory is
    two blocks of vectors plus a chunk x block sims matrix —
    independent of N. This removes :func:`brute_force_pairs`'s
    driver-broadcast cap; the O(N^2) compute is inherent to exact
    all-pairs and is spread over n_blocks*(n_blocks+1)/2 independent
    tasks. Results are identical to :func:`brute_force_pairs` (same
    rounding, same id1 < id2 contract).
    """
    import pandas as pd

    from pyspark.sql import types as T

    if n_blocks is None:
        n = corpus.count()
        n_blocks = max(1, -(-n // block_size))
    scale = float(10**round_to)

    tagged = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # row side of cells (_blk, j) for j >= _blk; column side of cells
    # (i, _blk) for i <= _blk. A pair with blocks (i <= j) meets in
    # cell (i, j) exactly once.
    left = tagged.select(
        id_col,
        vec_col,
        F.col("_blk").alias("_ci"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("_cj"),
        F.lit(0).alias("_side"),
    )
    right = tagged.select(
        id_col,
        vec_col,
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("_ci"),
        F.col("_blk").alias("_cj"),
        F.lit(1).alias("_side"),
    )
    rows = left.unionByName(right)

    out_schema = T.StructType(
        [
            T.StructField("id1", T.LongType()),
            T.StructField("id2", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        l = pdf[pdf["_side"] == 0]
        r = pdf[pdf["_side"] == 1]
        if l.empty or r.empty:
            return pd.DataFrame({"id1": [], "id2": [], "cosine_sim": []})
        lids = l[id_col].to_numpy()
        rids = r[id_col].to_numpy()
        lmat = np.stack(l[vec_col].to_numpy()).astype(np.float64)
        rmat = np.stack(r[vec_col].to_numpy()).astype(np.float64)
        lnorm = np.sqrt((lmat * lmat).sum(axis=1))
        rnorm = np.sqrt((rmat * rmat).sum(axis=1))
        outs = []
        # chunk the row side so the sims matrix stays chunk x block
        for s in range(0, len(lids), 1024):
            e = s + 1024
            sims = (lmat[s:e] @ rmat.T) / (lnorm[s:e, None] * rnorm[None, :])
            sims = np.floor(sims * scale + 0.5) / scale
            keep = (sims >= threshold) & (lids[s:e, None] != rids[None, :])
            rr, cc = np.nonzero(keep)
            if len(rr):
                a, b = lids[s:e][rr], rids[cc]
                outs.append(
                    pd.DataFrame(
                        {
                            "id1": np.minimum(a, b),
                            "id2": np.maximum(a, b),
                            "cosine_sim": sims[rr, cc],
                        }
                    )
                )
        if not outs:
            return pd.DataFrame({"id1": [], "id2": [], "cosine_sim": []})
        out = pd.concat(outs)
        # the diagonal cell sees each pair twice ((a,b) and (b,a));
        # off-diagonal cells see it once — drop the mirror
        return out.drop_duplicates(["id1", "id2"])

    return rows.groupBy("_ci", "_cj").applyInPandas(cell, schema=out_schema)


def dedupe_embedding_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Drop embedding near-duplicates: LSH candidate pairs -> connected
    components -> keep the min-id vector per component (composition of
    :func:`embedding_near_duplicate_pairs` and the dedup machinery)."""
    from parq_tools_spark.operators.dedup import dedupe_near_duplicates

    pairs = embedding_near_duplicate_pairs(
        corpus, threshold, id_col, vec_col, **lsh_kwargs
    )
    return dedupe_near_duplicates(corpus, pairs, id_col=id_col)


def _with_centroid_cells(
    df: DataFrame,
    centroids: list,
    vec_col: str,
    round_to: int = 6,
    nprobe: Optional[int] = None,
    out_col: str = "cell",
) -> DataFrame:
    """Append the nearest-centroid cell (or the top-``nprobe`` probe
    list) by ROUNDED cosine, vectorized: one numpy matmul per Arrow
    batch inside ``mapInPandas``.

    This replaces the per-centroid ``transform``/``aggregate`` cosine
    ladder (n_cells interpreted higher-order expressions per row —
    Catalyst does not codegen HOFs) with a single BLAS matmul per
    batch: map-side only, centroids broadcast, no shuffle.

    Contract (must match the SQL-oracle expression path bit-for-bit
    after rounding): cosine in float64, rounded portable
    ``floor(x*10^r + 0.5)/10^r``; argmax ties go to the LOWER cell
    index (numpy first-max); probe order is (rounded sim desc, cell
    asc) via a stable argsort on the negated sims.
    """
    import pandas as pd

    from pyspark.sql import types as T

    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    scale = float(10**round_to)
    bc = df.sparkSession.sparkContext.broadcast((cmat, cnorm))

    out_field = (
        T.StructField(out_col, T.IntegerType())
        if nprobe is None
        else T.StructField(out_col, T.ArrayType(T.IntegerType()))
    )
    schema = T.StructType(list(df.schema.fields) + [out_field])
    cols = [f.name for f in df.schema.fields]

    def run(batches):
        cmat_w, cnorm_w = bc.value
        for b in batches:
            out = b[cols].copy()
            if not len(b):
                out[out_col] = [] if nprobe is None else []
                yield out
                continue
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            vnorm = np.sqrt((mat * mat).sum(axis=1))
            sims = (mat @ cmat_w.T) / (vnorm[:, None] * cnorm_w[None, :])
            sims = np.floor(sims * scale + 0.5) / scale
            if nprobe is None:
                out[out_col] = sims.argmax(axis=1).astype(np.int32)
            else:
                order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
                out[out_col] = [r.tolist() for r in order.astype(np.int32)]
            yield out

    return df.mapInPandas(run, schema=schema)


# ------------------------------------------------------------- near-dup
def embedding_near_duplicate_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, sim >= threshold).

    LSH-banded candidate generation (same-bucket join) + exact cosine
    verification — the all-pairs matrix never materializes.
    """
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[0])
    width = n_planes // n_bands
    mask = (1 << width) - 1
    # materialized ONCE: the banded self-join below evaluates each
    # side independently when the planner picks a broadcast join, so
    # without this the hyperplane-projection signatures (a dim x
    # n_planes dot-product expression per row) would be computed
    # twice over the corpus (the §7 pair-generator pattern)
    from parq_tools_spark.operators._index_common import materialize as _mat

    sigs = _mat(lsh_signatures(corpus, vec_col, n_planes, seed, dim))
    banded = sigs.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("lsh_sig", bi * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bval"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, vec_col, "bk.band", "bk.bval")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
            F.col(f"a.{vec_col}").alias("v1"),
            F.col(f"b.{vec_col}").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cand.withColumn("cosine_sim", cosine_similarity_col("v1", "v2"))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id1", "id2", "cosine_sim")
    )


def _hashseed_rows(
    corpus: DataFrame, n: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """The first ``n`` corpus vectors ranked by (md5-bucket of id, id)
    — a closed-form, engine-recomputable seed-row choice shared by the
    hash-seeded IVF, PQ codebooks, and semantic dedup. Collects only
    ``n`` vectors (the seeds), never the corpus."""
    from parq_tools_spark.operators.sampling import hash_bucket

    rows = (
        corpus.select(id_col, vec_col, hash_bucket(F.col(id_col)).alias("_hb"))
        .orderBy("_hb", id_col)
        .limit(n)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    return [[float(x) for x in r[vec_col]] for r in rows]


def ivf_hashseed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """IVF top-k with deterministic hash-seeded centroids (no training).

    Centroids are the ``n_cells`` corpus vectors ranked first by the
    md5 hash of their id — a closed-form choice, so the ENTIRE index
    is engine-recomputable: assignment (argmax rounded cosine to a
    centroid, ties to the lower cell), probing (top-``nprobe`` cells
    per query), and the final rounded-cosine ranking all have exact
    SQL equivalents. Recall trails trained KMeans (this is the classic
    random-seed IVF baseline) — use :func:`ivf_build`/:func:`ivf_topk`
    for the trained path; use this one when reproducibility across
    engines/runs matters more than the last few recall points.

    Scale shape is the same as :func:`ivf_topk`: centroids ride a
    broadcast (no shuffle to assign), the corpus is filtered by probed
    cell before any query similarity is computed, and only (query,
    candidate) pairs ever move. Assignment and probing are one numpy
    matmul per Arrow batch (:func:`_with_centroid_cells`) — the
    round-3/4 expression-ladder version evaluated n_cells interpreted
    HOF cosines per corpus row and was the slowest query in the bench
    registry; the matmul path computes the identical rounded values.
    """
    query_id_col = query_id_col or id_col
    scale = float(10**round_to)
    centroids = _hashseed_rows(corpus, n_cells, id_col, vec_col)

    def _pr(col):
        return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)

    assigned = _with_centroid_cells(
        corpus.select(id_col, vec_col), centroids, vec_col, round_to, None, "cell"
    )
    probes = (
        _with_centroid_cells(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"),
            ),
            centroids,
            "_qvec",
            round_to,
            nprobe,
            "_probe",
        )
        .select("query_id", "_qvec", F.explode("_probe").alias("cell"))
    )
    cand = assigned.join(
        F.broadcast(probes),
        (assigned.cell == probes.cell) & (F.col(id_col) != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col(id_col),
        _pr(cosine_similarity_col(vec_col, "_qvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .drop("_rnk")
    )


# ---------------------------------------------------------------------- PQ
def opq_rotation(
    corpus: DataFrame,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 256,
):
    """Learn an OPQ-style orthogonal rotation (Ge et al. 2014,
    "Optimized Product Quantization", the parametric/PCA variant):
    PCA of a deterministic corpus sample + eigenvalue allocation
    spreads variance evenly across the ``m`` PQ subspaces, so the
    contiguous split after rotation stops wasting code bits on
    low-variance subspaces (the classic PQ failure mode when energy
    concentrates in a few dimensions).

    Deterministic end to end: the sample is the ``sample`` corpus
    rows ranked by md5 of their id (the same closed-form seeding as
    the codebooks), eigenvectors come from ``numpy.linalg.eigh`` on
    the sample covariance with a sign fix (largest-|component|
    positive), and the allocation greedily balances the per-subspace
    log-eigenvalue sums. Returns an orthogonal ``(dim, dim)`` matrix
    ``R``; vectors rotate as ``x @ R.T`` (norms preserved, so cosine
    scores are unchanged — only the quantization grid moves).

    Scale shape: one O(sample) collect + an O(dim^3) driver
    eigendecomposition; application is a matmul folded into the same
    ``mapInPandas`` passes PQ already runs. Pass the result to
    :func:`pq_build` and :func:`pq_topk` via ``rotation=``.
    """
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rows = np.asarray(
        _hashseed_rows(corpus, sample, id_col, vec_col), dtype=np.float64
    )
    rows /= np.sqrt((rows * rows).sum(axis=1, keepdims=True))
    centered = rows - rows.mean(axis=0, keepdims=True)
    cov = centered.T @ centered / max(len(rows), 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    # sign fix: deterministic across LAPACK builds
    for j in range(dim):
        k_ = np.argmax(np.abs(eigvecs[:, j]))
        if eigvecs[k_, j] < 0:
            eigvecs[:, j] = -eigvecs[:, j]
    # eigenvalue allocation: LPT greedy — largest eigenvalue first,
    # each assigned to the open subspace with the smallest accumulated
    # weight, balancing per-subspace log-variance products. Weights
    # are the logs SHIFTED to non-negative: unit-normalized data has
    # every eigenvalue < 1, so raw logs are all negative and a naive
    # min-budget greedy would INVERT (the fullest bucket has the most
    # negative sum and keeps winning — a contiguous fill, maximal
    # imbalance). Every bucket takes exactly ``sub`` items, so a
    # constant shift moves all bucket totals equally and preserves
    # which allocation is balanced.
    eps = 1e-12
    logs = np.log(np.maximum(eigvals, eps))
    weights = logs - logs.min()  # >= 0, eigenvalues sorted desc
    buckets: list = [[] for _ in range(m)]
    budget = np.zeros(m)
    for j in range(dim):
        open_ = [b for b in range(m) if len(buckets[b]) < sub]
        tgt = min(open_, key=lambda b: (budget[b], b))
        buckets[tgt].append(j)
        budget[tgt] += float(weights[j])
    perm = [j for b in buckets for j in b]
    return eigvecs[:, perm].T  # rows = allocated principal directions


def pq_build(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    rotation=None,
):
    """Product-quantize an embedding column (Jégou et al. 2011).

    Vectors are L2-normalized, split into ``m`` contiguous subvectors,
    and each subvector is replaced by the index of its nearest (L2)
    codeword — storage drops from ``dim * 4`` bytes to ``m`` small
    ints per vector, which is what makes billion-scale ANN candidate
    scoring RAM-resident.

    Codebooks are deterministic: the sub-vectors of the first
    ``n_codes`` corpus rows ranked by the md5 hash of their id (the
    same closed-form seeding as :func:`ivf_hashseed_topk`), so the
    whole index is reproducible across runs and engines — no trained
    state to ship. ``n_codes=None`` uses EVERY corpus row as a seed
    (the identity codebook: encoding is then exact, which is what the
    ``ann_pq_exact_equiv`` correctness gate exercises).

    Returns ``(codes_df, codebooks)``: ``codes_df`` is
    ``(id_col, codes array<int>)`` and ``codebooks`` a numpy array of
    shape ``(m, n_codes, dim // m)``.

    ``rotation``: optional orthogonal matrix from
    :func:`opq_rotation` — seeds and corpus vectors rotate before the
    contiguous split (queries must score with the same ``rotation=``
    in :func:`pq_topk`). Under a lossless codebook (``n_codes=None``)
    any orthogonal rotation leaves PQ scores EXACTLY equal to cosine
    (rotations preserve dot products), which is what the
    ``ann_opq_exact_equiv`` correctness gate exercises.

    Scale shape: seeds are collected (``n_codes`` rows, not the
    corpus); encoding is one ``mapInPandas`` pass — map-only, one
    numpy distance matrix per (batch, subspace), no shuffle.
    """
    codebooks = pq_codebooks(corpus, m, n_codes, id_col, vec_col, rotation)
    return (
        pq_encode(corpus, codebooks, id_col, vec_col, round_to, rotation),
        codebooks,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: "Optional[int]" = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rotation=None,
):
    """Derive :func:`pq_build`'s deterministic codebooks WITHOUT the
    encoding pass — ``(m, n_codes, dim//m)`` numpy array from the
    hash-seeded rows. Split out so callers that fuse encoding with
    other per-row work (``ann_index_build``'s single-pass
    encode+assign) can get the model without paying a corpus scan
    here."""
    first = corpus.select(vec_col).first()
    if first is None:
        raise ValueError("empty corpus")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    if n_codes is None:
        n_codes = corpus.count()
    seeds = np.asarray(
        _hashseed_rows(corpus, n_codes, id_col, vec_col), dtype=np.float64
    )
    seeds /= np.sqrt((seeds * seeds).sum(axis=1, keepdims=True))
    if rotation is not None:
        seeds = seeds @ np.asarray(rotation, dtype=np.float64).T
    # (m, n_codes, sub): codebook j holds the seeds' j-th subvectors
    return np.stack([seeds[:, j * sub : (j + 1) * sub] for j in range(m)])


def pq_encode_with_cells(
    corpus: DataFrame,
    centroids: list,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    rotation=None,
    keep_vec: bool = False,
    meta_cols=(),
):
    """:func:`pq_encode` and :func:`_with_centroid_cells` FUSED into
    one ``mapInPandas`` pass — the persisted ANN index's ingest shape
    (``ann_index_build`` / ``ann_index_add``), where running them
    separately would read the embedding column twice and then pay an
    id-equi-join to glue codes to cells.

    Bit-parity contract: the cell comes from the RAW vector's rounded
    cosine exactly as ``_with_centroid_cells`` computes it (same
    matmul, same ``vnorm`` product, same portable rounding, argmax
    ties to the lower cell), and the codes from the NORMALIZED
    (+rotated) vector exactly as ``pq_encode`` computes them — the
    shared-arithmetic guarantee that keeps the index bit-identical to
    the per-call scan paths (the ``ann_index_equiv`` gate).

    Returns ``(id_col, codes array<int>, cell int[, vec
    array<double>][, *meta_cols])`` — ``keep_vec=True`` carries the
    raw vector through for indexes built with ``store_vectors=True``;
    ``meta_cols`` rides the SAME Arrow batch through the encoder
    (zero extra shuffle, no id re-join), so indexes built with
    ``store_cols=`` carry filterable metadata next to each row's
    codes."""
    import pandas as pd

    from pyspark.sql import types as T

    cb_arr = np.asarray(codebooks, dtype=np.float64)
    sub = cb_arr.shape[2]
    rot = (
        None if rotation is None else np.asarray(rotation, dtype=np.float64)
    )
    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    bc = corpus.sparkSession.sparkContext.broadcast(
        (cb_arr, rot, cmat, cnorm)
    )
    scale = float(10**round_to)
    fields = [
        corpus.schema[id_col],
        T.StructField("codes", T.ArrayType(T.IntegerType())),
        T.StructField("cell", T.IntegerType()),
    ]
    if keep_vec:
        fields.append(
            T.StructField("vec", T.ArrayType(T.DoubleType()))
        )
    meta_cols = list(meta_cols)
    fields.extend(corpus.schema[c] for c in meta_cols)
    schema = T.StructType(fields)

    def encode_assign(batches):
        cb, r, cm, cn = bc.value
        for b in batches:
            if not len(b):
                out = {id_col: [], "codes": [], "cell": []}
                if keep_vec:
                    out["vec"] = []
                for c in meta_cols:
                    out[c] = []
                yield pd.DataFrame(out)
                continue
            raw = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            # cell: _with_centroid_cells' exact ops on the RAW matrix
            vnorm = np.sqrt((raw * raw).sum(axis=1))
            sims = (raw @ cm.T) / (vnorm[:, None] * cn[None, :])
            sims = np.floor(sims * scale + 0.5) / scale
            cells = sims.argmax(axis=1).astype(np.int32)
            # codes: pq_encode's exact ops on the NORMALIZED matrix
            mat = raw / np.sqrt((raw * raw).sum(axis=1, keepdims=True))
            if r is not None:
                mat = mat @ r.T
            codes = np.empty((len(b), cb.shape[0]), dtype=np.int32)
            for j in range(cb.shape[0]):
                x = mat[:, j * sub : (j + 1) * sub]
                d = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ cb[j].T)
                    + (cb[j] * cb[j]).sum(axis=1)[None, :]
                )
                d = np.floor(d * scale + 0.5) / scale
                codes[:, j] = d.argmin(axis=1)
            out = {
                id_col: b[id_col],
                "codes": [c.tolist() for c in codes],
                "cell": cells,
            }
            if keep_vec:
                out["vec"] = [v.tolist() for v in raw]
            for c in meta_cols:
                out[c] = b[c]
            yield pd.DataFrame(out)

    return corpus.select(id_col, vec_col, *meta_cols).mapInPandas(
        encode_assign, schema
    )


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    rotation=None,
) -> DataFrame:
    """Encode vectors against FIXED codebooks — the shared encoder of
    :func:`pq_build` (which derives the codebooks first) and the
    persisted ANN index's add path (``ann_index_add``, which must
    encode new batches under the index's FROZEN model rather than
    re-deriving seeds from the batch).

    Returns ``(id_col, codes array<int>)``. Map-only: one numpy
    distance matrix per (Arrow batch, subspace), codebooks broadcast,
    no shuffle. Per-subspace L2 distances are rounded to the
    ``10^-round_to`` grid BEFORE argmin (ties to the lower code index)
    so near-tied codewords resolve identically across engines
    regardless of float summation order — the SQL oracles round the
    same way."""
    import pandas as pd

    from pyspark.sql import types as T

    cb_arr = np.asarray(codebooks, dtype=np.float64)
    sub = cb_arr.shape[2]
    rot = (
        None
        if rotation is None
        else np.asarray(rotation, dtype=np.float64)
    )
    bc = corpus.sparkSession.sparkContext.broadcast((cb_arr, rot))
    scale = float(10**round_to)
    schema = T.StructType(
        [
            corpus.schema[id_col],
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def encode(batches):
        cb, r = bc.value
        for b in batches:
            if not len(b):
                yield pd.DataFrame({id_col: [], "codes": []})
                continue
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            mat /= np.sqrt((mat * mat).sum(axis=1, keepdims=True))
            if r is not None:
                mat = mat @ r.T
            codes = np.empty((len(b), cb.shape[0]), dtype=np.int32)
            for j in range(cb.shape[0]):
                x = mat[:, j * sub : (j + 1) * sub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2
                d = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ cb[j].T)
                    + (cb[j] * cb[j]).sum(axis=1)[None, :]
                )
                d = np.floor(d * scale + 0.5) / scale
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: b[id_col], "codes": [r.tolist() for r in codes]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_topk(
    codes_df: DataFrame,
    codebooks,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    round_to: int = 6,
    rotation=None,
) -> DataFrame:
    """ANN top-k over PQ codes by asymmetric distance (ADC).

    Each query precomputes an ``(m, n_codes)`` table of subspace dot
    products against the codebooks; scoring a corpus vector is then
    ``m`` table lookups summed — no decompression. With normalized
    inputs the score approximates cosine similarity (exactly equals it
    under the identity codebook).

    Scale shape: the query tables are broadcast; the corpus side is
    one map-only ``mapInPandas`` lookup pass over the codes. Only
    (query, id, score) triples shuffle into the per-query top-k
    window — the same shape as :func:`brute_force_topk` but over
    ``m``-byte codes instead of ``dim``-float vectors.
    Returns (query_id, vec_id, pq_score, rank); ranking is
    (rounded score desc, id asc), the registry's portable total order.
    """
    import pandas as pd

    from pyspark.sql import types as T

    query_id_col = query_id_col or id_col
    cb = np.asarray(codebooks, dtype=np.float64)
    m, n_codes, sub = cb.shape
    scale = float(10**round_to)

    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).collect()
    if not q_rows:
        raise ValueError("no queries")
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([[float(x) for x in r["_qvec"]] for r in q_rows])
    q_mat /= np.sqrt((q_mat * q_mat).sum(axis=1, keepdims=True))
    if rotation is not None:
        # same rotation the codes were built under (opq_rotation):
        # orthogonal, so the scores still approximate plain cosine
        q_mat = q_mat @ np.asarray(rotation, dtype=np.float64).T
    # tables[q, j, c] = dot(q_j, codebook[j][c])
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_ids), m, sub), cb)

    spark = codes_df.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, tables))
    id_field = codes_df.schema[id_col]
    schema = T.StructType(
        [
            T.StructField("query_id", id_field.dataType),
            T.StructField(id_col, id_field.dataType),
            T.StructField("pq_score", T.DoubleType()),
        ]
    )

    def score(batches):
        ids, tabs = bc.value
        jj = np.arange(m)
        for b in batches:
            if not len(b):
                yield pd.DataFrame(
                    {"query_id": [], id_col: [], "pq_score": []}
                )
                continue
            codes = np.stack(b["codes"].to_numpy()).astype(np.int64)
            out_id, out_qid, out_s = [], [], []
            for qi, qid in enumerate(ids):
                s = tabs[qi][jj[None, :], codes].sum(axis=1)
                s = np.floor(s * scale + 0.5) / scale
                out_qid.extend([qid] * len(b))
                out_id.extend(b[id_col].tolist())
                out_s.extend(s.tolist())
            yield pd.DataFrame(
                {"query_id": out_qid, id_col: out_id, "pq_score": out_s}
            )

    scored = codes_df.mapInPandas(score, schema).filter(
        F.col(id_col) != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------- semantic dedup
def semantic_dedupe(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    block_rows: int = 2048,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the corpus into ``n_cells`` cells, and within each cell
    drop every vector that has a LOWER-id neighbor with rounded cosine
    similarity >= ``threshold``. Returns the surviving corpus rows.

    Unlike :func:`dedupe_embedding_near_duplicates` (LSH candidates +
    connected components, transitive closure), this is the paper's
    cluster-local rule: comparisons never cross cell boundaries, so
    the work is exactly the within-cell pair count — the knob that
    makes semantic dedup tractable at billions of documents.

    Cells come from the closed-form hash-seeded centroids
    (:func:`_hashseed_rows` + argmax rounded cosine, ties to the lower
    cell), so the drop set is deterministic and engine-recomputable —
    the ``semantic_dedupe`` registry query value-checks it against
    DuckDB. Shape: centroid assignment is one broadcast matmul pass
    (no shuffle); the within-cell pairwise scoring is ONE
    ``applyInPandas`` per cell computing the Gram matrix in blocked
    numpy (the expression-join formulation evaluated one interpreted
    HOF cosine per pair and was ~5x slower at sf0.1); only dropped ids
    leave the cell. Skewed cells can be split first with
    :func:`ivf_rebalance_subcells`; size ``n_cells`` so a cell fits a
    task (the SemDeDup constant-cell-size regime).

    ``block_rows`` bounds the Gram block so memory per task is
    ``cell_rows * block_rows`` doubles, not ``cell_rows**2``.
    """
    import pandas as pd

    from pyspark.sql import types as T

    centroids = _hashseed_rows(corpus, n_cells, id_col, vec_col)
    assigned = _with_centroid_cells(
        corpus.select(id_col, vec_col), centroids, vec_col, round_to, None, "cell"
    )
    scale = float(10**round_to)
    thr = float(threshold)

    out_schema = T.StructType([corpus.schema[id_col]])

    def cell_dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({id_col: pdf[id_col][:0]})
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        mat = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        norm = np.sqrt((mat * mat).sum(axis=1))
        dropped = np.zeros(len(ids), dtype=bool)
        for start in range(1, len(ids), block_rows):
            end = min(start + block_rows, len(ids))
            # rounded cosine of every earlier row vs columns start..end
            s = (mat[:end] @ mat[start:end].T) / (
                norm[:end, None] * norm[None, start:end]
            )
            s = np.floor(s * scale + 0.5) / scale
            for cj, j in enumerate(range(start, end)):
                if (s[:j, cj] >= thr).any():
                    dropped[j] = True
        return pd.DataFrame({id_col: ids[dropped]})

    dropped_ids = assigned.groupBy("cell").applyInPandas(
        cell_dropped, schema=out_schema
    )
    return corpus.join(dropped_ids, on=id_col, how="left_anti")


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    round_to: int = 6,
    rotation=None,
) -> DataFrame:
    """IVF-PQ layered ANN (the standard billion-scale index layout):
    hash-seeded coarse cells prune the corpus to ~nprobe/n_cells, then
    PQ codes score the surviving candidates by asymmetric distance —
    the scan reads m small ints per candidate, not dim floats.

    Everything is closed-form (hash-seeded centroids AND codebooks),
    so the full pipeline is engine-recomputable: the
    ``ann_ivfpq_topk`` registry query value-checks it against DuckDB,
    and ``ann_ivfpq_equiv`` pins the degenerate configuration
    (nprobe = n_cells, identity codebook) to the brute-force baseline.

    Scale shape: assignment and encoding are map-only broadcast-matmul
    passes; probes ride a BroadcastHashJoin on the cell key (the
    corpus never shuffles); ADC scoring is one more map-only pass;
    only (query, id, score) triples reach the group-limited top-k
    window. With the persisted index's cell-partitioned layout
    (``ann_index_build``) the cell filter becomes partition pruning
    at the source.

    ``rotation``: optional OPQ orthogonal matrix
    (:func:`opq_rotation`) applied to the PQ stage only — seeds,
    corpus vectors and query vectors rotate before the contiguous
    subvector split, exactly as in :func:`pq_build`/:func:`pq_topk`;
    coarse cell assignment stays in the original space (rotations
    preserve the dot products it ranks by, so rotating there would
    only reshuffle floating-point tie-breaks). Under the degenerate
    configuration (``nprobe=n_cells``, ``n_codes=None``) any
    orthogonal rotation leaves results EXACTLY equal to brute force —
    the ``ann_opq_ivfpq_equiv`` correctness gate.
    """
    query_id_col = query_id_col or id_col

    centroids = _hashseed_rows(corpus, n_cells, id_col, vec_col)
    codes_df, codebooks = pq_build(
        corpus,
        m=m,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        round_to=round_to,
        rotation=rotation,
    )
    assigned = _with_centroid_cells(
        corpus.select(id_col, vec_col), centroids, vec_col, round_to, None, "cell"
    ).select(id_col, "cell")
    coded = codes_df.join(assigned, on=id_col)

    probes = (
        _with_centroid_cells(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(vec_col).alias("_qvec"),
            ),
            centroids,
            "_qvec",
            round_to,
            nprobe,
            "_probe",
        )
        .select("query_id", F.explode("_probe").alias("cell"))
    )

    cb = np.asarray(codebooks, dtype=np.float64)
    m_, n_codes_, sub = cb.shape
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).collect()
    if not q_rows:
        raise ValueError("no queries")
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([[float(x) for x in r["_qvec"]] for r in q_rows])
    q_mat /= np.sqrt((q_mat * q_mat).sum(axis=1, keepdims=True))
    if rotation is not None:
        # same rotation the codes were built under (opq_rotation)
        q_mat = q_mat @ np.asarray(rotation, dtype=np.float64).T
    tables = np.einsum(
        "qjs,jcs->qjc", q_mat.reshape(len(q_ids), m_, sub), cb
    )

    cand = coded.join(
        F.broadcast(probes),
        (coded.cell == probes.cell) & (F.col(id_col) != F.col("query_id")),
    ).select("query_id", id_col, "codes")

    scored = adc_score(
        cand, q_ids, tables, id_col, corpus.schema[id_col].dataType, round_to
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def adc_score(
    cand: DataFrame,
    q_ids: list,
    tables,
    id_col: str,
    id_type,
    round_to: int = 6,
    qid_type=None,
) -> DataFrame:
    """Asymmetric-distance scoring of ``(query_id, id, codes)``
    candidate rows: each row's score is ``m`` lookups into its query's
    precomputed ``(m, n_codes)`` dot-product table, summed and rounded
    to the ``10^-round_to`` grid — one map-only ``mapInPandas`` pass,
    tables broadcast, no shuffle. Shared by :func:`ivf_pq_topk` and
    the persisted index's serving path (``ann_index_topk``), so the
    two can never drift in arithmetic or rounding."""
    import pandas as pd

    from pyspark.sql import types as T

    tabs_arr = np.asarray(tables, dtype=np.float64)
    m_ = tabs_arr.shape[1]
    scale = float(10**round_to)
    bc = cand.sparkSession.sparkContext.broadcast((list(q_ids), tabs_arr))
    schema = T.StructType(
        [
            T.StructField("query_id", qid_type or id_type),
            T.StructField(id_col, id_type),
            T.StructField("pq_score", T.DoubleType()),
        ]
    )

    def score(batches):
        ids, tabs = bc.value
        idx = {qid: i for i, qid in enumerate(ids)}
        jj = np.arange(m_)
        for b in batches:
            if not len(b):
                yield pd.DataFrame({"query_id": [], id_col: [], "pq_score": []})
                continue
            codes = np.stack(b["codes"].to_numpy()).astype(np.int64)
            qidx = b["query_id"].map(idx).to_numpy()
            # gather each row's table by its query: tabs[q][j, code_j]
            s = tabs[qidx[:, None], jj[None, :], codes].sum(axis=1)
            s = np.floor(s * scale + 0.5) / scale
            yield pd.DataFrame(
                {
                    "query_id": b["query_id"],
                    id_col: b[id_col],
                    "pq_score": s,
                }
            )

    return cand.mapInPandas(score, schema)
