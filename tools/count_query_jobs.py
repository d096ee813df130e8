"""Count Spark JOBS (and wall time) per declared query entry.

The query-level twin of tools/count_jobs.py: runs each named
``queries()`` entry through the bench's noop sink inside a unique job
group and counts the jobs it submits via
StatusTracker.getJobIdsForGroup. Job counts are deterministic — immune
to box noise — so old-vs-new counts are primary evidence that a change
removed (or added) work on a query path; wall times are secondary.

Caveat: getJobIdsForGroup reads the UI status store, which retains
only ``spark.ui.retainedJobs`` jobs (default 1000) — an entry that
submits very many jobs would silently undercount, so the session
below pins retainedJobs high enough for any declared entry.

Usage:
    SPARK_GRAFT_CPUS=8 python tools/count_query_jobs.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = list(sys.argv[2:])


def main() -> int:
    import __spark_entry__ as entry_mod
    from parq_tools_spark import get_spark

    spark = get_spark(
        "count-query-jobs", **{"spark.ui.retainedJobs": "10000"}
    )
    sc = spark.sparkContext
    queries = entry_mod.queries()
    names = ONLY or list(queries)

    # one warm action so the first measured entry doesn't absorb
    # JVM/session startup; a dataset dir without region.parquet just
    # degrades to a cold first measurement instead of aborting the run
    try:
        spark.read.parquet(os.path.join(SF, "region.parquet")).count()
    except Exception:
        pass

    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not a declared query", flush=True)
            continue
        group = f"cqj_{name}_{time.monotonic_ns()}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            jobs = sc.statusTracker().getJobIdsForGroup(group)
            print(f"RESULT {name} jobs={len(jobs)} wall={wall:.3f}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}", flush=True)
        finally:
            # PySpark's SparkContext doesn't expose clearJobGroup();
            # the documented JVM API is one py4j hop away and also
            # resets interruptOnCancel (advice fix)
            sc._jsc.clearJobGroup()
            try:
                spark.catalog.clearCache()
                for rdd in sc._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
            except Exception:
                pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
