"""Snapshot repository: incremental index snapshots + restore.

The reference's snapshot model (``server/src/main/java/org/elasticsearch/
repositories/blobstore/BlobStoreRepository.java``,
``es/snapshots/SnapshotsService.java``): segments are immutable, so a
snapshot stores each segment file once in a blob store and later
snapshots of an unchanged index reuse the existing blobs — only the
per-snapshot metadata is new. Restore materializes the file list back
into an index directory.

Here the blob store is a directory of content-addressed files
(``blobs/<sha256>``), which makes the incremental property automatic:
re-snapshotting an unchanged segment writes nothing. Snapshot metadata
(``snapshots/<name>.json``) records the relative path -> digest map plus
the index manifest, so a restored index is byte-identical.

Layout contract matches build_index: the repo path must be reachable
from wherever snapshot/restore runs (driver-side; segment files stream
through this process, not through Ray tasks — snapshots are a control
plane operation, sized in segment files, not in documents).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _iter_files(index_dir: str):
    for root, _dirs, files in os.walk(index_dir):
        for f in sorted(files):
            p = os.path.join(root, f)
            yield os.path.relpath(p, index_dir), p


def create_snapshot(index_dir: str, repo: str, name: str) -> dict:
    """Snapshot ``index_dir`` into repository ``repo`` under ``name``.

    Returns the snapshot metadata. Blobs already present (same content
    hash) are reused — the incremental path.
    """
    if not os.path.exists(os.path.join(index_dir, "index_manifest.json")):
        raise ValueError(f"not an index dir (no index_manifest.json): {index_dir}")
    blob_dir = os.path.join(repo, "blobs")
    snap_dir = os.path.join(repo, "snapshots")
    os.makedirs(blob_dir, exist_ok=True)
    os.makedirs(snap_dir, exist_ok=True)
    snap_path = os.path.join(snap_dir, f"{name}.json")
    if os.path.exists(snap_path):
        raise ValueError(f"snapshot already exists: {name}")
    files, reused, stored = {}, 0, 0
    for rel, full in _iter_files(index_dir):
        digest = _sha256(full)
        blob = os.path.join(blob_dir, digest)
        if os.path.exists(blob):
            reused += 1
        else:
            tmp = blob + ".tmp"
            shutil.copyfile(full, tmp)
            os.replace(tmp, blob)  # atomic publish, crash-safe
            stored += 1
        files[rel] = digest
    meta = {
        "name": name,
        "index_dir": os.path.abspath(index_dir),
        "files": files,
        "stored_blobs": stored,
        "reused_blobs": reused,
        "created_epoch": time.time(),
    }
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, snap_path)
    return meta


def list_snapshots(repo: str) -> list[str]:
    snap_dir = os.path.join(repo, "snapshots")
    if not os.path.isdir(snap_dir):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(snap_dir) if f.endswith(".json")
    )


def restore_snapshot(repo: str, name: str, dest: str) -> dict:
    """Materialize snapshot ``name`` into ``dest`` (must not already be
    an index). Verifies every blob's digest on the way out."""
    snap_path = os.path.join(repo, "snapshots", f"{name}.json")
    with open(snap_path) as f:
        meta = json.load(f)
    if os.path.exists(os.path.join(dest, "index_manifest.json")):
        raise ValueError(f"destination is already an index: {dest}")
    for rel, digest in meta["files"].items():
        blob = os.path.join(repo, "blobs", digest)
        if _sha256(blob) != digest:
            raise ValueError(f"corrupt blob for {rel}: {digest}")
        out = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copyfile(blob, out)
    return meta


def delete_snapshot(repo: str, name: str, gc_blobs: bool = True) -> dict:
    """Remove a snapshot; with ``gc_blobs`` also delete blobs no other
    snapshot references (the reference's blob-store cleanup on snapshot
    delete, ``BlobStoreRepository#deleteSnapshots``)."""
    snap_path = os.path.join(repo, "snapshots", f"{name}.json")
    if not os.path.exists(snap_path):
        raise ValueError(f"unknown snapshot: {name}")
    os.remove(snap_path)
    removed = 0
    if gc_blobs:
        referenced: set[str] = set()
        for other in list_snapshots(repo):
            with open(os.path.join(repo, "snapshots", f"{other}.json")) as f:
                referenced |= set(json.load(f)["files"].values())
        blob_dir = os.path.join(repo, "blobs")
        for b in os.listdir(blob_dir) if os.path.isdir(blob_dir) else []:
            if b not in referenced:
                os.remove(os.path.join(blob_dir, b))
                removed += 1
    return {"deleted": name, "blobs_removed": removed}


def slm_run(policy: dict) -> dict:
    """One SLM tick (``x-pack/plugin/ilm`` SnapshotLifecycleService /
    ``SnapshotLifecyclePolicy``): take a snapshot named
    ``<name>-<NNNNNN>`` of ``config.index_dir`` into ``repository``,
    then apply ``retention`` — keep at least ``min_count`` newest, drop
    snapshots older than ``expire_after_s`` beyond that, and cap the
    total at ``max_count``. Deterministic counter naming stands in for
    the reference's date+uuid names."""
    prefix = policy["name"]
    repo = policy["repository"]
    index_dir = policy["config"]["index_dir"]
    mine = [s for s in list_snapshots(repo)
            if s.startswith(prefix + "-")]
    seq = 1 + max(
        (int(s.rsplit("-", 1)[1]) for s in mine
         if s.rsplit("-", 1)[1].isdigit()), default=0)
    snap = create_snapshot(index_dir, repo, f"{prefix}-{seq:06d}")
    taken = snap["name"]
    ret = policy.get("retention") or {}
    mine = sorted(
        s for s in list_snapshots(repo) if s.startswith(prefix + "-"))
    deleted = []
    min_count = int(ret.get("min_count", 0))
    max_count = ret.get("max_count")
    expire_s = ret.get("expire_after_s")
    # oldest-first candidates beyond the protected newest min_count
    droppable = mine[: max(0, len(mine) - min_count)] if min_count else list(mine)
    if expire_s is not None:
        now = time.time()
        for s_name in droppable:
            with open(os.path.join(repo, "snapshots",
                                   f"{s_name}.json")) as f:
                created = json.load(f).get("created_epoch", now)
            if now - created >= float(expire_s) and s_name != taken:
                delete_snapshot(repo, s_name)
                deleted.append(s_name)
    if max_count is not None:
        mine = sorted(s for s in list_snapshots(repo)
                      if s.startswith(prefix + "-"))
        while len(mine) > int(max_count):
            victim = mine.pop(0)
            if victim == taken:
                break
            delete_snapshot(repo, victim)
            deleted.append(victim)
    return {"snapshot": taken, "deleted": deleted}


def mount_searchable_snapshot(repo: str, name: str, cache_root: str):
    """Searchable snapshot (``x-pack/plugin/searchable-snapshots``,
    TransportMountSearchableSnapshotAction): serve queries directly off
    a repository snapshot. The blob store IS the storage tier; this
    engine materializes the snapshot once into a content-keyed cache
    directory (the reference's shared/frozen cache analogue — repeat
    mounts of the same snapshot reuse it) and returns a LocalSearcher
    over it. The mounted index is read-only by construction."""
    cache = os.path.join(cache_root, f"mount-{name}")
    if not os.path.exists(os.path.join(cache, "index_manifest.json")):
        tmp = cache + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        restore_snapshot(repo, name, tmp)
        os.replace(tmp, cache)
    from raydex.search.scatter import LocalSearcher

    return LocalSearcher(cache)
