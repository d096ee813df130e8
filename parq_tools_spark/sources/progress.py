"""Job-progress reporting for file-level facades.

Spark-native rebuild of the reference's progress hooks
(``/root/reference/parq_tools/utils/progress.py:5-26``): the reference
wraps chunk iterators in a tqdm-style bar; a Spark facade runs ONE
distributed job, so progress is the cluster's task counters instead —
a daemon thread polls ``StatusTracker`` while the action runs and
invokes a callback with (description, completed_tasks, total_tasks).

The callback never runs on the hot path (polling thread only), works
identically on local[N] and a 1000-executor cluster, and costs one
driver-side RPC per poll interval — nothing at data scale.
"""

from __future__ import annotations

import sys
import threading
from contextlib import contextmanager
from typing import Callable, Optional

from pyspark.sql import SparkSession

__all__ = ["job_progress", "stderr_progress"]

ProgressCallback = Callable[[str, int, int], None]


def stderr_progress(desc: str, done: int, total: int) -> None:
    """Default sink: one carriage-returned status line on stderr."""
    if total:
        pct = 100.0 * done / total
        sys.stderr.write(f"\r{desc}: {done}/{total} tasks ({pct:.0f}%)")
        if done >= total:
            sys.stderr.write("\n")
    else:
        # only the guaranteed final call can arrive with total == 0: the
        # block launched no Spark jobs (metadata-only action) or failed
        # before any job started — close the line either way
        sys.stderr.write(f"\r{desc}: 0/0 tasks (no spark jobs ran)\n")
    sys.stderr.flush()


@contextmanager
def job_progress(
    spark: SparkSession,
    desc: str = "job",
    callback: Optional[ProgressCallback] = None,
    interval: float = 0.5,
):
    """Report task-level progress of whatever Spark actions run inside
    the ``with`` block.

    Counters are cumulative across all stages the block launches (a
    facade like ``concat_parquet_files`` may run several). The callback
    is always invoked at least once, at exit, with the final counts —
    so short local jobs still produce a completion line.
    """
    import uuid

    cb = callback or stderr_progress
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    stop = threading.Event()
    # a dedicated job group makes every job the block launches —
    # active OR already finished — discoverable, so even sub-poll-
    # interval jobs report correct final counts
    group = f"job_progress-{uuid.uuid4().hex[:12]}"
    prev_group = sc.getLocalProperty("spark.jobGroup.id")
    prev_desc = sc.getLocalProperty("spark.job.description")
    sc.setJobGroup(group, desc)
    # stage id -> (completed, total); cumulative so finished stages
    # keep contributing to the totals
    seen: dict[int, tuple[int, int]] = {}
    lock = threading.Lock()

    def poll_once() -> tuple[int, int]:
        try:
            for jid in tracker.getJobIdsForGroup(group):
                job = tracker.getJobInfo(jid)
                if job is None:
                    continue
                for sid in job.stageIds:
                    info = tracker.getStageInfo(sid)
                    if info is not None and info.numTasks > 0:
                        with lock:
                            seen[sid] = (info.numCompletedTasks, info.numTasks)
        except Exception:
            pass  # tracker races with job teardown; counters just lag
        with lock:
            done = sum(c for c, _ in seen.values())
            total = sum(t for _, t in seen.values())
        return done, total

    def run() -> None:
        while not stop.wait(interval):
            done, total = poll_once()
            if total:
                cb(desc, done, total)

    thread = threading.Thread(target=run, daemon=True)
    thread.start()
    completed = False
    try:
        yield
        completed = True
    finally:
        stop.set()
        thread.join(timeout=5)
        done, total = poll_once()
        sc.setLocalProperty("spark.jobGroup.id", prev_group)
        sc.setLocalProperty("spark.job.description", prev_desc)
        if completed:
            # skipped/cached stages can under-report completions; the
            # block finished, so every launched task finished
            cb(desc, max(done, total), total)
        else:
            # the block raised — report the truthful partial counts
            cb(desc, done, total)
