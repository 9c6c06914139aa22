"""Async search — submit / poll / fetch / cancel over Ray tasks.

Reference: ``x-pack/plugin/async-search`` (SubmitAsyncSearchAction,
GetAsyncSearchAction, DeleteAsyncSearchAction): a search runs detached
from the caller; the submit call returns an id plus whatever is ready
within ``wait_for_completion_timeout``, later GETs poll or block, and
DELETE cancels. The Ray-native shape is exactly a remote task: the
query executes inside a Ray worker (so the coordinator is free), the
id maps to the ObjectRef, and ``ray.wait(timeout=...)`` supplies the
wait-for-completion semantics."""

from __future__ import annotations

import itertools


def _run_search(index_dir: str, qdict: dict, k: int):
    from raydex.search.scatter import LocalSearcher

    return LocalSearcher(index_dir).search_query(qdict, k=k)


_REMOTE_RUN = None  # the ray.remote wrapper, created once on first use


class AsyncSearchService:
    """Session-local async-search store (the reference persists
    responses to the ``.async-search`` system index; this engine's
    store lives with the driver process, the same lifetime Ray object
    ownership gives the response objects)."""

    def __init__(self):
        import ray

        self._ray = ray
        self._tasks: dict[str, object] = {}
        self._meta: dict[str, dict] = {}
        self._ids = itertools.count(1)

    def submit(self, index_dir: str, qdict: dict, k: int = 10,
               wait_for_completion_s: float = 0.0) -> dict:
        """Start the search in a Ray worker; return the id and, when it
        finishes within the wait window, the response inline (the
        reference's partial/complete submit contract)."""
        global _REMOTE_RUN
        if _REMOTE_RUN is None:  # register the remote function ONCE
            _REMOTE_RUN = self._ray.remote(num_cpus=1)(_run_search)
        sid = f"async_{next(self._ids):06d}"
        self._tasks[sid] = _REMOTE_RUN.remote(index_dir, qdict, k)
        self._meta[sid] = {"index": index_dir, "k": k}
        return self.get(sid, wait_s=wait_for_completion_s)

    def get(self, sid: str, wait_s: float = 0.0) -> dict:
        ray = self._ray
        ref = self._tasks.get(sid)
        if ref is None:
            raise ValueError(f"unknown async search id {sid!r}")
        done, _ = ray.wait([ref], num_returns=1,
                           timeout=max(0.0, float(wait_s)))
        if not done:
            return {"id": sid, "is_running": True, "response": None}
        try:
            hits = ray.get(ref)
        except Exception as e:  # surfaced like the reference's failure
            return {"id": sid, "is_running": False, "error": str(e),
                    "response": None}
        return {"id": sid, "is_running": False,
                "response": {"hits": hits}}

    def delete(self, sid: str) -> bool:
        """Cancel a running search / drop a stored response."""
        ref = self._tasks.pop(sid, None)
        self._meta.pop(sid, None)
        if ref is None:
            return False
        try:
            self._ray.cancel(ref, force=True)
        except Exception:
            pass
        return True
