"""Point-in-time readers (``_pit``).

Reference shape: ``server/src/main/java/org/elasticsearch/action/
search/TransportOpenPointInTimeAction.java`` — an opaque id pinning a
consistent reader set across requests with a ``keep_alive`` lease;
later writes, deletes, merges and rollovers never change what the id
sees. Lucene gets this from immutable segment files + refcounted
readers; raydex gets it from the same property the reshape tier
exploits: segment artifacts are immutable and side-files
(``livedocs.npy``) are replaced via ``os.replace``, never mutated in
place. ``open_pit`` therefore hardlinks the current segment set into a
self-contained read-only index view (clone_index) — O(files), no data
copied — and the id is just that view, base64-wrapped. Searching a pit
is searching that directory with any LocalSearcher/RaySearcher.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import time
import uuid

PIT_META = "pit.json"


def _decode(pit_id: str) -> str:
    d = json.loads(base64.urlsafe_b64decode(pit_id.encode()).decode())
    return d["dir"]


def open_pit(index_dir: str, keep_alive_s: float = 300.0,
             root: str | None = None) -> str:
    """Pin the index's CURRENT segment set; returns the opaque pit id.
    ``root`` defaults to ``<index>/_pits`` (hardlinks need the same
    filesystem anyway)."""
    from raydex.index.reshape import clone_index

    root = root or os.path.join(index_dir, "_pits")
    name = f"pit-{uuid.uuid4().hex[:12]}"
    d = os.path.join(root, name)
    os.makedirs(root, exist_ok=True)
    clone_index(index_dir, d)
    with open(os.path.join(d, PIT_META), "w") as f:
        json.dump({"source": index_dir, "created": time.time(),
                   "expires": time.time() + float(keep_alive_s)}, f)
    return base64.urlsafe_b64encode(
        json.dumps({"dir": d}).encode()).decode()


def pit_dir(pit_id: str, keep_alive_s: float | None = None) -> str:
    """The pinned index view for a pit id (→ hand to a searcher).
    Passing ``keep_alive_s`` renews the lease like the reference's
    per-request ``pit.keep_alive``. Raises on a closed/expired-and-
    collected pit."""
    d = _decode(pit_id)
    mp = os.path.join(d, PIT_META)
    if not os.path.exists(mp):
        raise ValueError("point in time has been closed or expired")
    if keep_alive_s is not None:
        with open(mp) as f:
            meta = json.load(f)
        meta["expires"] = time.time() + float(keep_alive_s)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, mp)
    return d


def close_pit(pit_id: str) -> bool:
    """DELETE /_pit: drop the pinned view; False if already gone."""
    d = _decode(pit_id)
    if not os.path.exists(os.path.join(d, PIT_META)):
        return False
    shutil.rmtree(d, ignore_errors=True)
    return True


def expire_pits(index_dir: str, root: str | None = None,
                now: float | None = None) -> list[str]:
    """GC every pit view under ``root`` whose keep_alive lease lapsed
    (the reference's periodic reaper). Returns removed dirs."""
    root = root or os.path.join(index_dir, "_pits")
    now = time.time() if now is None else now
    removed = []
    if not os.path.isdir(root):
        return removed
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        mp = os.path.join(d, PIT_META)
        try:
            with open(mp) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            continue
        if meta["expires"] <= now:
            shutil.rmtree(d, ignore_errors=True)
            removed.append(d)
    return removed
