"""Snapshot repository: incremental index snapshots + restore.

The reference's snapshot model (``server/src/main/java/org/elasticsearch/
repositories/blobstore/BlobStoreRepository.java``,
``es/snapshots/SnapshotsService.java``): segments are immutable, so a
snapshot stores each segment file once in a blob store and later
snapshots of an unchanged index reuse the existing blobs — only the
per-snapshot metadata is new. Restore materializes the file list back
into an index directory.

The blob store is content-addressed (``blobs/<sha256>``), which makes
the incremental property automatic: re-snapshotting an unchanged
segment writes nothing. Snapshot metadata (``snapshots/<name>.json``)
records the relative path -> digest map plus the index manifest, so a
restored index is byte-identical.

Repository addressing — the ``repository-s3`` / ``repository-gcs`` /
``repository-azure`` plugin tier collapses to ONE URI-addressed
backend: a repo path with a scheme (``s3://bucket/path``,
``gs://…``, ``az://…``, ``memory://…`` for tests) opens an fsspec
filesystem; a plain path keeps the local-filesystem backend
(``repository-fs``). Object stores have atomic single-object puts, so
the local backend's tmp+rename dance is unnecessary there — the same
crash-safety contract either way.

Layout contract matches build_index: the repo must be reachable from
wherever snapshot/restore runs (driver-side; segment files stream
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


class _LocalRepo:
    """repository-fs: plain directory, atomic publish via tmp+rename."""

    def __init__(self, root: str):
        self.root = root

    def _p(self, key: str) -> str:
        return os.path.join(self.root, key)

    def exists(self, key: str) -> bool:
        return os.path.exists(self._p(key))

    def read_bytes(self, key: str) -> bytes:
        with open(self._p(key), "rb") as f:
            return f.read()

    def write_bytes(self, key: str, data: bytes) -> None:
        p = self._p(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, p)

    def put_file(self, local_path: str, key: str) -> None:
        p = self._p(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        shutil.copyfile(local_path, tmp)
        os.replace(tmp, p)

    def get_file(self, key: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path), exist_ok=True)
        shutil.copyfile(self._p(key), local_path)

    def list_keys(self, prefix: str) -> list[str]:
        d = self._p(prefix)
        if not os.path.isdir(d):
            return []
        return sorted(os.listdir(d))

    def delete(self, key: str) -> None:
        os.remove(self._p(key))


class _ObjectRepo:
    """URI-addressed object store behind fsspec (the repository-s3 /
    -gcs / -azure plugin tier; ``memory://`` backs the tests). Puts of
    a single object are atomic on every real object store, so no
    tmp+rename is needed."""

    def __init__(self, uri: str):
        import fsspec

        self.fs, self.root = fsspec.core.url_to_fs(uri)
        self.root = self.root.rstrip("/")

    def _p(self, key: str) -> str:
        return f"{self.root}/{key}"

    def exists(self, key: str) -> bool:
        return self.fs.exists(self._p(key))

    def read_bytes(self, key: str) -> bytes:
        return self.fs.cat_file(self._p(key))

    def write_bytes(self, key: str, data: bytes) -> None:
        self.fs.pipe_file(self._p(key), data)

    def put_file(self, local_path: str, key: str) -> None:
        self.fs.put_file(local_path, self._p(key))

    def get_file(self, key: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path), exist_ok=True)
        self.fs.get_file(self._p(key), local_path)

    def list_keys(self, prefix: str) -> list[str]:
        d = self._p(prefix)
        if not self.fs.exists(d):
            return []
        return sorted(os.path.basename(p.rstrip("/"))
                      for p in self.fs.ls(d, detail=False))

    def delete(self, key: str) -> None:
        self.fs.rm_file(self._p(key))


def open_repository(repo: str):
    """Resolve a repository address: URI scheme -> object-store
    backend, plain path -> local filesystem backend."""
    if "://" in repo:
        return _ObjectRepo(repo)
    return _LocalRepo(repo)


def create_snapshot(index_dir: str, repo: str, name: str) -> dict:
    """Snapshot ``index_dir`` into repository ``repo`` under ``name``.

    Returns the snapshot metadata. Blobs already present (same content
    hash) are reused — the incremental path.
    """
    if not os.path.exists(os.path.join(index_dir, "index_manifest.json")):
        raise ValueError(f"not an index dir (no index_manifest.json): {index_dir}")
    r = open_repository(repo)
    snap_key = f"snapshots/{name}.json"
    if r.exists(snap_key):
        raise ValueError(f"snapshot already exists: {name}")
    files, reused, stored = {}, 0, 0
    for rel, full in _iter_files(index_dir):
        digest = _sha256(full)
        blob_key = f"blobs/{digest}"
        if r.exists(blob_key):
            reused += 1
        else:
            r.put_file(full, blob_key)
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
    r.write_bytes(snap_key, json.dumps(meta, indent=1).encode())
    return meta


def list_snapshots(repo: str) -> list[str]:
    r = open_repository(repo)
    return sorted(
        f[: -len(".json")] for f in r.list_keys("snapshots")
        if f.endswith(".json")
    )


def _load_meta(r, name: str) -> dict:
    return json.loads(r.read_bytes(f"snapshots/{name}.json"))


def restore_snapshot(repo: str, name: str, dest: str) -> dict:
    """Materialize snapshot ``name`` into ``dest`` (must not already be
    an index). Verifies every blob's digest on the way out."""
    r = open_repository(repo)
    meta = _load_meta(r, name)
    if os.path.exists(os.path.join(dest, "index_manifest.json")):
        raise ValueError(f"destination is already an index: {dest}")
    for rel, digest in meta["files"].items():
        out = os.path.join(dest, rel)
        r.get_file(f"blobs/{digest}", out)
        if _sha256(out) != digest:
            raise ValueError(f"corrupt blob for {rel}: {digest}")
    return meta


def delete_snapshot(repo: str, name: str, gc_blobs: bool = True) -> dict:
    """Remove a snapshot; with ``gc_blobs`` also delete blobs no other
    snapshot references (the reference's blob-store cleanup on snapshot
    delete, ``BlobStoreRepository#deleteSnapshots``)."""
    r = open_repository(repo)
    snap_key = f"snapshots/{name}.json"
    if not r.exists(snap_key):
        raise ValueError(f"unknown snapshot: {name}")
    r.delete(snap_key)
    removed = 0
    if gc_blobs:
        referenced: set[str] = set()
        for other in list_snapshots(repo):
            referenced |= set(_load_meta(r, other)["files"].values())
        for b in r.list_keys("blobs"):
            if b not in referenced:
                r.delete(f"blobs/{b}")
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
    r = open_repository(repo)
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
            created = _load_meta(r, s_name).get("created_epoch", now)
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
