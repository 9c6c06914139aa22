"""Index state blocks: `_close` / `_open`, `PUT _block/<block>`,
`_freeze` / `_unfreeze`.

Reference model: MetadataIndexStateService (close/open flip the index
state and install an INDEX_CLOSED_BLOCK; a closed index rejects both
reads and writes), TransportAddIndexBlockAction (write/read/metadata
blocks), FreezeIndexAction (frozen = searchable, write-blocked,
throttled readers — the throttling has no analogue here).

State lives in ``index_state.json`` at the index root; enforcement
hooks sit at the searcher constructor (reads) and the build/delete
entry points (writes).
"""

from __future__ import annotations

import json
import os


class IndexBlockedError(RuntimeError):
    pass


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, "index_state.json")


def _load(index_dir: str) -> dict:
    p = _path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"closed": False, "frozen": False, "blocks": {}}


def _store(index_dir: str, state: dict) -> None:
    p = _path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)


def close_index(index_dir: str) -> dict:
    st = _load(index_dir)
    st["closed"] = True
    _store(index_dir, st)
    return {"acknowledged": True, "closed": True}


def open_index(index_dir: str) -> dict:
    st = _load(index_dir)
    st["closed"] = False
    _store(index_dir, st)
    return {"acknowledged": True, "closed": False}


def add_block(index_dir: str, block: str) -> dict:
    """`PUT /<index>/_block/<block>`: write | read | read_only |
    metadata."""
    if block not in ("write", "read", "read_only", "metadata"):
        raise ValueError(f"unknown block {block!r}")
    st = _load(index_dir)
    st.setdefault("blocks", {})[block] = True
    _store(index_dir, st)
    return {"acknowledged": True, "shards_acknowledged": True}


def remove_block(index_dir: str, block: str) -> dict:
    st = _load(index_dir)
    st.get("blocks", {}).pop(block, None)
    _store(index_dir, st)
    return {"acknowledged": True}


def freeze_index(index_dir: str) -> dict:
    """Frozen = still searchable, writes rejected (FreezeIndexAction;
    the reference's throttled-reader behavior has no analogue)."""
    st = _load(index_dir)
    st["frozen"] = True
    st.setdefault("blocks", {})["write"] = True
    _store(index_dir, st)
    return {"acknowledged": True}


def unfreeze_index(index_dir: str) -> dict:
    st = _load(index_dir)
    st["frozen"] = False
    st.get("blocks", {}).pop("write", None)
    _store(index_dir, st)
    return {"acknowledged": True}


def check_read(index_dir: str) -> None:
    st = _load(index_dir)
    if st.get("closed"):
        raise IndexBlockedError(f"index [{index_dir}] is closed")
    if st.get("blocks", {}).get("read"):
        raise IndexBlockedError(f"index [{index_dir}] blocked for read")


def check_write(index_dir: str) -> None:
    st = _load(index_dir)
    if st.get("closed"):
        raise IndexBlockedError(f"index [{index_dir}] is closed")
    b = st.get("blocks", {})
    if b.get("write") or b.get("read_only"):
        raise IndexBlockedError(
            f"index [{index_dir}] blocked for write (FORBIDDEN/8)")
