"""Benchmark harness: runs EVERY registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The timed set is ``__spark_entry__.queries()`` in full — parity ops,
analytics, LLM-pipeline operators AND property-check queries — so a
regression in any registered operator is visible round-over-round
(BENCH_r{N} query set is a superset of BENCH_r{N-1}). The headline
``value`` stays the sum over HEADLINE_QUERIES (the round-1 set) so the
top-line number remains comparable across rounds.

Each query is executed to completion through the `noop` sink so
map-only work cannot be pruned by a count()-style action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# round-1 headline set: kept fixed so the top-line total is comparable
HEADLINE_QUERIES = [
    "filter_dsl",
    "concat_tall",
    "concat_wide",
    "sort_multi",
    "reindex",
    "dedupe_keep_first",
    "profile",
    "calculated_column",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "window_running",
    "pivot_events",
    "rollup_revenue",
    "ngram_freq",
    "asof_join",
    "range_join",
    "events_hourly",
    "events_sessionize",
    "text_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "dedupe_text_exact",
    "ngram_jaccard",
    "minhash_pairs",
    "simhash_pairs",
    "embedding_sim_pairs",
    "embedding_sim_pairs_blocked",
    "ann_topk",
    "multimodal_features",
    "hash_split",
    "clean_text",
    "near_dedupe_cc",
]


def _bench_minhash_index(spark, sf_dir) -> "dict[str, float]":
    """Steady-state cost of the incremental MinHash index
    (dedup.minhash_index_*): build the persistent index on 90% of the
    documents table, then time ONE ingest step — band a 10% "new"
    batch, query it against the index band rows, drop in-batch and
    vs-index near-dups, and append the survivors' band rows. The two
    timings land in BENCH_FULL.json as minhash_index_build and
    minhash_index_ingest10pct; neither is a headline query."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parq_tools_spark.operators.dedup import (
        incremental_dedupe,
        minhash_index_write,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    indexed = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    tmp = tempfile.mkdtemp(prefix="mh_index_bench_")
    path = os.path.join(tmp, "idx")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        minhash_index_write(indexed, path, num_hashes=64, bands=16)
        out["minhash_index_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        survivors = incremental_dedupe(
            spark, path, batch, threshold=0.5, update_index=True
        )
        survivors.write.format("noop").mode("overwrite").save()
        out["minhash_index_ingest10pct"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _bench_stream_near_dedup(spark, sf_dir) -> "dict[str, float]":
    """Steady-state cost of the streaming near-dedup path
    (streaming/near_dedup.py): the documents table arrives as 4
    micro-batches (file source, maxFilesPerTrigger=1) against a fresh
    index with compact_every=2, so the timing covers the per-batch
    overheads the batch-equivalent bench (minhash_index_ingest10pct)
    does not: marker read/commit, per-batch overwrite dirs, index
    bootstrap and mid-stream compaction. Lands in BENCH_FULL.json as
    stream_near_dedup_4batches (total) and stream_near_dedup_per_batch
    (total/4, the steady-state figure); not headline queries."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parq_tools_spark.streaming.near_dedup import (
        start_near_dedupe_stream,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="stream_nd_bench_")
    src = os.path.join(tmp, "src")
    # arrival files staged OUTSIDE the timer
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.parquet(
            os.path.join(src, f"b{i}")
        )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        q = start_near_dedupe_stream(
            stream,
            os.path.join(tmp, "idx"),
            os.path.join(tmp, "out"),
            os.path.join(tmp, "ck"),
            threshold=0.5,
            num_hashes=64,
            bands=16,
            compact_every=2,
            available_now=True,
        )
        finished = q.awaitTermination(600)
        if not finished:
            q.stop()
            raise TimeoutError("near-dedup stream did not drain in 600s")
        total = time.perf_counter() - t0
        out["stream_near_dedup_4batches"] = round(total, 3)
        out["stream_near_dedup_per_batch"] = round(total / 4, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _bench_bm25_index(spark, sf_dir) -> "dict[str, float]":
    """The serving case the persisted BM25 index exists for: REPEATED
    queries. Build the index once on the documents table (timed as
    bm25_index_build), then time 5 distinct single queries served
    from the index vs the same 5 from a full corpus scan. Lands in
    BENCH_FULL.json as bm25_index_build / bm25_query_from_index /
    bm25_query_from_scan (each query figure = mean sec/query); the
    index-vs-scan ratio is the amortization the staleness contract in
    SCALE.md buys."""
    import shutil
    import tempfile

    from parq_tools_spark.operators.search import (
        bm25_index_build,
        bm25_index_topk,
        bm25_topk,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    queries = [
        "stream merge window",
        "customer table value",
        "query window join",
        "fast hash scan",
        "spark group row data",
    ]
    tmp = tempfile.mkdtemp(prefix="bm25_bench_")
    path = os.path.join(tmp, "idx")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        bm25_index_build(docs, path)
        out["bm25_index_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        for q in queries:
            bm25_index_topk(spark, path, q, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
        out["bm25_query_from_index"] = round(
            (time.perf_counter() - t0) / len(queries), 3
        )
        t0 = time.perf_counter()
        for q in queries:
            bm25_topk(docs, q, k=10).write.format("noop").mode(
                "overwrite"
            ).save()
        out["bm25_query_from_scan"] = round(
            (time.perf_counter() - t0) / len(queries), 3
        )
        # the realistic serving shape: a batch amortizes the one
        # postings read across queries — this is where the index's
        # O(matching-postings) vs O(corpus) asymptotics show even at
        # bench scale (both single-query figures above carry ~1 job
        # of fixed local-mode overhead that dwarfs a small corpus)
        from parq_tools_spark.operators.search import bm25_index_topk_batch

        qdf = spark.createDataFrame(
            list(enumerate(queries)), "query_id long, query string"
        )
        t0 = time.perf_counter()
        bm25_index_topk_batch(spark, path, qdf, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        out["bm25_batch_from_index_per_query"] = round(
            (time.perf_counter() - t0) / len(queries), 3
        )

        # index MAINTENANCE lifecycle: one 10%-sized append (fresh
        # ids), a forced compaction folding the segments, and the
        # same query served post-compaction — so regressions in the
        # add/compact paths and in post-compaction serving are
        # visible round-over-round
        from pyspark.sql import functions as F

        from parq_tools_spark.operators.search import bm25_index_add
        from parq_tools_spark.operators.search import bm25_index_compact

        batch = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10_000_000
        )
        t0 = time.perf_counter()
        bm25_index_add(batch, path)
        out["bm25_index_add10pct"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        bm25_index_compact(spark, path, min_files_per_bucket=1)
        out["bm25_index_compact"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        bm25_index_topk(spark, path, queries[0], k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        out["bm25_query_post_compact"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _bench_ann_index(spark, sf_dir) -> "dict[str, float]":
    """The persisted vector-ANN index lifecycle at bench scale: build
    (model + cell-partitioned codes + manifest), a 10%-sized append
    under the frozen model, serving 8 queries from the index, and the
    same 8 through the per-call ivf_pq_topk (which re-derives the
    model every invocation — the cost the index amortizes away).
    Lands in BENCH_FULL.json as ann_index_build / ann_index_add10pct
    / ann_query_from_index / ann_query_per_call (per-query means for
    the last two)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parq_tools_spark.operators.ann_index import (
        ann_index_add,
        ann_index_build,
        ann_index_topk,
    )
    from parq_tools_spark.operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < 8).localCheckpoint(eager=True)
    tmp = tempfile.mkdtemp(prefix="ann_index_bench_")
    path = os.path.join(tmp, "idx")
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        ann_index_build(emb, path, n_cells=8, m=8, n_codes=16)
        out["ann_index_build"] = round(time.perf_counter() - t0, 3)
        batch = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
            "vec_id", F.col("vec_id") + 10_000_000
        )
        t0 = time.perf_counter()
        ann_index_add(batch, path)
        out["ann_index_add10pct"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        ann_index_topk(spark, path, qs, k=10, nprobe=2).write.format(
            "noop"
        ).mode("overwrite").save()
        out["ann_query_from_index"] = round(
            (time.perf_counter() - t0) / 8, 3
        )
        t0 = time.perf_counter()
        ivf_pq_topk(
            emb, qs, k=10, n_cells=8, nprobe=2, m=8, n_codes=16
        ).write.format("noop").mode("overwrite").save()
        out["ann_query_per_call"] = round(
            (time.perf_counter() - t0) / 8, 3
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _bench_media_decode(spark, sf_dir) -> "dict[str, float]":
    """Real-decode throughput of the pure-numpy codec tier: fabricate
    one 64x64 PNG per document row (deterministic from doc_id, done
    OUTSIDE the timer and persisted), then time (a) feature extraction
    + (b) perceptual hashing over the blobs. Lands in BENCH_FULL.json
    as media_feature_extract / media_phash; the production tier (PIL)
    is strictly faster, so these are honest lower bounds."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id")
        .limit(500)
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )

    def fabricate(batches):
        from parq_tools_spark.operators.codecs import encode_png

        for b in batches:
            blobs = []
            for did in b["doc_id"]:
                rng = np.random.RandomState(int(did) % (2**31))
                img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
                img[8:40, 8:56] = rng.randint(0, 256, 3, dtype=np.uint8)
                blobs.append(encode_png(img))
            yield pd.DataFrame({"media_id": b["doc_id"], "blob": blobs})

    tmp = tempfile.mkdtemp(prefix="media_bench_")
    out: dict[str, float] = {}
    try:
        path = os.path.join(tmp, "media.parquet")
        docs.mapInPandas(fabricate, schema).write.parquet(path)
        media = spark.read.parquet(path)

        from parq_tools_spark.operators.multimodal import (
            extract_features,
            with_image_phash,
        )

        t0 = time.perf_counter()
        extract_features(media).write.format("noop").mode("overwrite").save()
        out["media_feature_extract"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        with_image_phash(media).select("media_id", "phash").write.format(
            "noop"
        ).mode("overwrite").save()
        out["media_phash"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _bench_index_serve(spark, sf_dir) -> "dict[str, float]":
    """SERVE-phase timings over PREBUILT indexes (r16): the registry
    entries for the index-served ops rebuild their index per call for
    oracle hermeticity, so their bench numbers are dominated by build
    cost and a serve-path regression hides under build noise. Here
    each index builds ONCE (untimed) and the timed figure is the
    phase a production deployment repeats: contamination served from
    the positional index, metadata-only updates (one segment +
    tombstone commit), the store_cols backfill, and where=-filtered
    band queries. Lands in BENCH_FULL.json as *_serve figures."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from parq_tools_spark.operators.ann_index import (
        ann_index_build,
        ann_index_update_metadata,
    )
    from parq_tools_spark.operators.dedup import (
        minhash_index_query,
        minhash_index_write,
    )
    from parq_tools_spark.operators.search import (
        bm25_index_add_metadata_col,
        bm25_index_build,
        bm25_index_update_metadata,
        contamination_from_index,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text", "lang")
    emb = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    tmp = tempfile.mkdtemp(prefix="idx_serve_bench_")
    out: dict[str, float] = {}
    try:
        # --- positional BM25 index, built once ---
        pos = os.path.join(tmp, "pos")
        bm25_index_build(
            docs.select("doc_id", "text"), pos, n_buckets=8,
            store_positions=True,
        )
        ev = docs.filter(F.col("doc_id") % 25 == 0).select(
            F.col("doc_id").alias("eval_id"), "text"
        )
        t0 = time.perf_counter()
        contamination_from_index(
            spark, pos, ev, k=3, threshold=0.6
        ).write.format("noop").mode("overwrite").save()
        out["contamination_from_index_serve"] = round(
            time.perf_counter() - t0, 3
        )

        # --- store_cols BM25 index: update + backfill phases ---
        bm = os.path.join(tmp, "bm")
        bm25_index_build(docs, bm, n_buckets=8, store_cols=["lang"])
        flips = docs.filter(F.col("doc_id") % 97 == 0).select(
            "doc_id", F.lit("zz").alias("lang")
        )
        t0 = time.perf_counter()
        bm25_index_update_metadata(spark, bm, flips)
        out["bm25_update_metadata_serve"] = round(
            time.perf_counter() - t0, 3
        )
        t0 = time.perf_counter()
        bm25_index_add_metadata_col(
            spark, bm,
            docs.select("doc_id", (F.col("doc_id") % 3).alias("grade")),
        )
        out["bm25_add_metadata_col_serve"] = round(
            time.perf_counter() - t0, 3
        )
        # the prune leg is the same O(index) rewrite in reverse
        from parq_tools_spark.operators.search import (
            bm25_index_drop_metadata_col,
        )

        t0 = time.perf_counter()
        bm25_index_drop_metadata_col(spark, bm, "grade")
        out["bm25_drop_metadata_col_serve"] = round(
            time.perf_counter() - t0, 3
        )

        # --- ANN store_cols index: metadata flip ---
        ann = os.path.join(tmp, "ann")
        ann_index_build(
            emb, ann, n_cells=8, m=8, n_codes=16, store_cols=["label"]
        )
        aflips = emb.filter(F.col("vec_id") % 97 == 0).select(
            "vec_id", F.lit(0).cast("int").alias("label")
        )
        t0 = time.perf_counter()
        ann_index_update_metadata(spark, ann, aflips)
        out["ann_update_metadata_serve"] = round(
            time.perf_counter() - t0, 3
        )

        # --- where=-filtered band query over a prebuilt index ---
        mh = os.path.join(tmp, "mh")
        minhash_index_write(
            docs.filter(F.col("doc_id") % 2 == 0), mh,
            num_hashes=64, bands=16, store_cols=["lang"],
        )
        t0 = time.perf_counter()
        minhash_index_query(
            spark, mh, docs.filter(F.col("doc_id") % 2 == 1),
            threshold=0.5, where="lang == 'en'",
        ).write.format("noop").mode("overwrite").save()
        out["minhash_where_serve"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _spin_calibration(n: int = 2_000_000) -> float:
    """Wall ms for a fixed single-core integer loop, best of 3."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = 0
        for i in range(n):
            x += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def main() -> None:
    import __spark_entry__ as entry_mod
    from parq_tools_spark import get_spark

    # contention guard: timings on a loaded box are upper bounds, not
    # measurements (rounds 3 and 4 both produced phantom "regressions"
    # from concurrent Spark runs). Record the load so the payload
    # carries its own credibility signal.
    ncpus = os.cpu_count() or 1
    load_start = os.getloadavg()[0]
    cpu_ms = _spin_calibration()
    if load_start > 0.5 * ncpus:
        print(
            f"BENCH-WARNING: load {load_start:.1f} on {ncpus} cpus at start "
            "- timings will be inflated by contention",
            file=sys.stderr,
        )

    spark = get_spark("bench")
    queries = entry_mod.queries()

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    # headline first (stable ordering round-over-round), then the rest
    ordered = HEADLINE_QUERIES + [n for n in queries if n not in HEADLINE_QUERIES]

    # SPARK_GRAFT_BENCH_ONLY="a,b,c" restricts the run (targeted quiet
    # re-measurement of specific queries; skips the index scenario too)
    only = {
        n.strip()
        for n in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",")
        if n.strip()
    }
    if only:
        ordered = [n for n in ordered if n in only]

    # optional per-query repeats (min-of-N) for noise-controlled local
    # re-measurement; the driver's per-round run keeps the default n=1
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "1")))

    def _isolate() -> None:
        # drop SQL caches and any localCheckpoint RDDs a query left
        # behind, so block-eviction pressure from earlier queries
        # cannot distort later timings — run after EVERY attempt,
        # including failed ones. The gc.collect() matters too: JVM
        # broadcast/checkpoint blocks are freed by the ContextCleaner
        # only after the PYTHON handle is collected, and 2x98 queries'
        # worth of pinned blocks measurably inflates late timings.
        try:
            import gc

            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            gc.collect()
        except Exception:
            pass

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in ordered:
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            try:
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # one broken query must not void the bench
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"BENCH-ERROR {name}: {errors[name]}", file=sys.stderr)
                # a flaky query is an errored query: void its timing so
                # the payload never claims both a result and an error
                best = None
                _isolate()
                break
            elapsed = time.perf_counter() - t0
            best = elapsed if best is None else min(best, elapsed)
            _isolate()
        if best is not None:
            timings[name] = round(best, 3)

    # steady-state incremental-ingest benchmark (not a registry query:
    # it writes/updates an on-disk index, so it's timed as a scenario)
    if not only:
        for scenario, fn in (
            ("minhash_index_roundtrip", _bench_minhash_index),
            ("bm25_index", _bench_bm25_index),
            ("ann_index", _bench_ann_index),
            ("index_serve", _bench_index_serve),
            ("media_decode", _bench_media_decode),
            ("stream_near_dedup", _bench_stream_near_dedup),
        ):
            try:
                timings.update(fn(spark, SF_DIR))
            except Exception as exc:
                errors[scenario] = f"{type(exc).__name__}: {exc}"[:200]
                print(
                    f"BENCH-ERROR {scenario}: {errors[scenario]}",
                    file=sys.stderr,
                )
            _isolate()

    total = round(sum(timings.get(n, 0.0) for n in HEADLINE_QUERIES), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    load_end = os.getloadavg()[0]
    # The driver tail-captures only the LAST ~2000 chars of stdout:
    # the rounds-3/4 payloads carried all 88 per-query timings, blew
    # that window, and were recorded unparsed (BENCH_r03/r04
    # "parsed": null). The headline line therefore carries ONLY the
    # headline-set timings (compact, 2dp); the full per-query map
    # goes to BENCH_FULL.json next to this script.
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {
            n: round(timings[n], 2) for n in HEADLINE_QUERIES if n in timings
        },
        "sf": float(sf) if sf else SF_DIR,
        "n_timed": len(timings),
        "full": "BENCH_FULL.json",
        # load_1m_start is the pre-existing load (this process hadn't
        # started work yet): > ~0.5*ncpus means a concurrent workload
        # was inflating every timing above
        "load": {
            "start": round(load_start, 1),
            "end": round(load_end, 1),
            "ncpus": ncpus,
            "contended": load_start > 0.5 * ncpus,
            # single-core spin wall-time (ms, best of 3) for a FIXED
            # work amount: a machine-speed scalar. This VM has shown
            # ~2x host-level slowdowns that load avg and /proc/stat
            # steal do NOT surface; comparing cpu_ms across records
            # separates "engine regressed" from "box got slower".
            # Reference: ~105 ms on this box when healthy.
            "cpu_ms": cpu_ms,
            # min-of-N repeats per query (SPARK_GRAFT_BENCH_N): n>1
            # removes first-execution JVM-warmup noise, which has
            # shown 2-3x inflation on early-run queries some days
            "n_repeats": repeat,
        },
    }
    if errors:
        # count + a truncated name list — full text already went to
        # stderr line-by-line; the tail window is the hard budget
        payload["errors"] = {
            "count": len(errors),
            "queries": sorted(errors)[:5],
        }
    # SPARK_GRAFT_BENCH_OUT redirects the full per-query map so quiet
    # local runs (BENCH_QUIET.json) and driver-condition runs
    # (BENCH_FULL.json, often load-contended) stay distinct files and
    # rounds compare like-for-like
    out_name = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    payload["full"] = out_name
    full = dict(payload)
    full["queries"] = timings
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           out_name), "w") as f:
        json.dump(full, f, indent=1)
    spark.stop()
    # the headline JSON is the LAST stdout line (nothing — not even Spark
    # shutdown chatter — may print after it; the driver reads the tail)
    sys.stdout.flush()
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > 1900:  # hard budget: the driver's 2000-char tail
        payload["queries"] = {}
        line = json.dumps(payload, separators=(",", ":"))
    print(line, flush=True)


if __name__ == "__main__":
    main()
