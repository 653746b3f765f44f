"""Driver-side job overlap (guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; independent actions are only sequential because driver
code calls them sequentially.  ``overlap_jobs`` submits independent
thunks from a small thread pool so one job's stage tail back-fills
executor slots the next job can use — wall-clock drops toward the
slowest single job instead of the sum.

Used by the streaming sinks' per-artifact fold legs
(``streaming.pipeline._run_fold_legs``) and by operators whose commit
consists of several independent table writes (e.g. the MinHash index's
bands + shingles tables).  Callers own the commit-ordering argument:
only jobs whose relative order is immaterial to crash-replay semantics
may be overlapped (each job must own its write targets end-to-end, and
any manifest/marker flip that commits the group must happen AFTER the
pool joins).
"""

from __future__ import annotations


def overlap_jobs(jobs, spark=None) -> None:
    """Run ``jobs`` (zero-arg callables, each typically one or more
    Spark actions) concurrently; join all, then re-raise the first
    error.  ``inheritable_thread_target`` keeps JVM thread-locals (job
    group / description) correct per job.  With 0-1 jobs this is a
    plain call — no pool."""
    if len(jobs) <= 1:
        for job in jobs:
            job()
        return
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    wrap = (
        inheritable_thread_target(spark)
        if spark is not None
        else inheritable_thread_target
    )
    errs = []
    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        futs = [ex.submit(wrap(job)) for job in jobs]
        for f in futs:
            try:
                f.result()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errs.append(e)
    if errs:
        raise errs[0]
