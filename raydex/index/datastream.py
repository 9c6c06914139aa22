"""Data streams — append-only named streams over generation-numbered
backing indexes.

Reference: ``server/.../cluster/metadata/DataStream.java`` +
``x-pack/plugin/data-streams`` (CreateDataStreamAction,
DataStreamsStatsAction, rollover integration): a data stream owns a
timestamp field and an ordered list of backing indexes named
``.ds-<stream>-<generation>``; WRITES target only the newest
generation, SEARCHES resolve to every generation, and rollover appends
the next generation. This engine keeps the same contract with
directories as indexes: the registry records stream -> backing dirs in
``datastreams.json`` under a root; each generation is a normal raydex
index built with :func:`raydex.index.build.build_index` into
``write_dir()``.
"""

from __future__ import annotations

import json
import os
import time


class DataStreamRegistry:
    """Filesystem-backed data stream metadata (one JSON doc per root,
    same durability model as :class:`raydex.index.aliases.AliasRegistry`)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "datastreams.json")

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _store(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self.path)

    @staticmethod
    def backing_name(stream: str, generation: int) -> str:
        return f".ds-{stream}-{generation:06d}"

    def create(self, stream: str,
               timestamp_field: str = "@timestamp") -> dict:
        data = self._load()
        if stream in data:
            raise ValueError(f"data stream {stream!r} already exists")
        data[stream] = {
            "timestamp_field": timestamp_field,
            "generation": 1,
            "indices": [self.backing_name(stream, 1)],
            "created_epoch": time.time(),
        }
        self._store(data)
        return self.get(stream)

    def get(self, stream: str) -> dict:
        data = self._load()
        if stream not in data:
            raise ValueError(f"unknown data stream {stream!r}")
        return dict(data[stream], name=stream)

    def streams(self) -> dict:
        return self._load()

    def rollover(self, stream: str) -> dict:
        """Append the next generation; writes move there immediately
        (the reference's rollover-on-a-data-stream path — conditions
        live in ILM, callers check them before invoking)."""
        data = self._load()
        if stream not in data:
            raise ValueError(f"unknown data stream {stream!r}")
        s = data[stream]
        old = self.backing_name(stream, s["generation"])
        s["generation"] += 1
        new = self.backing_name(stream, s["generation"])
        s["indices"].append(new)
        self._store(data)
        return {"rolled_over": True, "old_index": old, "new_index": new,
                "generation": s["generation"]}

    def delete(self, stream: str) -> None:
        data = self._load()
        data.pop(stream, None)
        self._store(data)

    # ------------------------------------------------------- resolution

    def write_dir(self, stream: str) -> str:
        """Directory of the CURRENT write generation (bulk requests on a
        data stream only ever append to the newest backing index)."""
        s = self.get(stream)
        return os.path.join(self.root, s["indices"][-1])

    def search_dirs(self, stream: str) -> list[str]:
        """Every BUILT backing index dir, oldest first (searches span
        all generations; a just-rolled generation may not be built yet)."""
        from raydex.index.build import INDEX_MANIFEST

        s = self.get(stream)
        return [
            os.path.join(self.root, name) for name in s["indices"]
            if os.path.exists(
                os.path.join(self.root, name, INDEX_MANIFEST))
        ]

    def searcher(self, stream: str):
        """A LocalSearcher over every built generation (union IDF via
        the multi-index search machinery)."""
        from raydex.search.scatter import LocalSearcher

        dirs = self.search_dirs(stream)
        if not dirs:
            raise ValueError(f"data stream {stream!r} has no built "
                             f"backing index yet")
        return LocalSearcher(dirs)
