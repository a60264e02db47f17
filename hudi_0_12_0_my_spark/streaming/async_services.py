"""Async table services alongside a streaming sink.

Re-expression of the reference's async service model
(HoodieStreamingSink.scala:41-139 triggerAsyncCompactor/Cleaner +
hudi-client/hudi-client-common/.../async/AsyncCompactService.java): the sink
SCHEDULES a compaction inline with the micro-batch commit (cheap timeline
write, deterministic instant order) and a single background worker EXECUTES
the pending plan while later micro-batches keep committing —
run_compaction's three-phase locking (timeline transitions under the table
lock, the heavy merge job outside it) makes the overlap safe, so the stream
cadence is no longer stalled by compaction wall time.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor

from ..services.clustering import (clustering_due, run_clustering,
                                   schedule_clustering)
from ..services.compaction import (compaction_due, run_compaction,
                                   schedule_compaction)


class AsyncTableServices:
    """One background worker executing table services for ONE table.

    Usage with the streaming sink::

        svc = AsyncTableServices(table)
        q = stream_write(table, df, ckpt, inline_compact=False,
                         async_services=svc).trigger(availableNow=True).start()
        q.awaitTermination(); svc.close()

    ``maybe_trigger`` is called by the sink after every committed batch: it
    schedules a compaction plan when the NUM_COMMITS trigger fires and hands
    execution to the worker. At most one service execution is in flight
    (the reference's AsyncCompactService consumes one pending instant at a
    time); triggers arriving while one runs are picked up by a later batch.
    """

    def __init__(self, table, compact: bool = True, clean: bool = False,
                 cluster: bool = False, cluster_kwargs: dict | None = None):
        self.table = table
        self.compact = compact
        self.clean = clean
        # async clustering (HoodieStreamingSink STREAMING_ASYNC_CLUSTERING):
        # triggered by clustering_due (commits since last clustering);
        # cluster_kwargs flow to schedule_clustering (sort_cols, layout, ...)
        self.cluster = cluster
        self.cluster_kwargs = dict(cluster_kwargs or {})
        self._pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="async-table-service")
        self._inflight: Future | None = None
        self._lock = threading.Lock()
        self.completed: list[str] = []     # finished service instants
        self.errors: list[Exception] = []

    def _execute(self, plan: dict | None, cluster_plan: dict | None) -> None:
        try:
            if plan is not None:
                ins = run_compaction(self.table, plan=plan)
                if ins:
                    self.completed.append(ins)
            if cluster_plan is not None:
                ins = run_clustering(self.table, plan=cluster_plan)
                if ins:
                    self.completed.append(ins)
            if self.clean:
                self.table.clean()
        except Exception as e:  # noqa: BLE001 — surfaced via .errors/raise_on
            self.errors.append(e)

    def maybe_trigger(self) -> bool:
        """Schedule + hand off execution if a service is due. Returns True
        when something was handed to the worker."""
        with self._lock:
            if self._inflight is not None and not self._inflight.done():
                return False
            plan, cluster_plan = None, None
            if self.compact and compaction_due(self.table):
                plan = schedule_compaction(self.table)
            if self.cluster and clustering_due(self.table):
                cluster_plan = schedule_clustering(self.table,
                                                   **self.cluster_kwargs)
            if plan is None and cluster_plan is None and not self.clean:
                return False
            self._inflight = self._pool.submit(self._execute, plan,
                                               cluster_plan)
            return True

    def wait(self, timeout: float | None = None) -> None:
        """Block until the in-flight execution (if any) finishes."""
        with self._lock:
            fut = self._inflight
        if fut is not None:
            fut.result(timeout=timeout)

    def close(self, wait: bool = True) -> None:
        self._pool.shutdown(wait=wait)
        if self.errors:
            raise self.errors[0]
