"""Enrich policy lifecycle (`PUT/GET/DELETE _enrich/policy/<name>` +
`_enrich/policy/<name>/_execute`) — the x-pack enrich plugin's policy
model (x-pack/plugin/enrich: TransportPutEnrichPolicyAction,
EnrichPolicyRunner).

A policy names a source table, a match field and the enrich fields.
Execute materializes the lookup as a compact parquet under the policy
root (the reference builds a system `.enrich-*` index the same way:
one segment-optimized snapshot per execution, EnrichPolicyRunner).
The ingest-side `enrich` processor (ops/processors.py p_enrich) takes
the loaded lookup dict — a broadcast small side by design, matching
the reference's node-local enrich index reads.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


class EnrichRegistry:
    """Policy store under one root directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "enrich_policies.json")

    def _load(self) -> dict:
        if os.path.exists(self.path):
            with open(self.path) as f:
                return json.load(f)
        return {}

    def _store(self, data: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, self.path)

    def put_policy(self, name: str, policy: dict) -> dict:
        """policy = {"match": {"indices": <parquet path/dir>,
        "match_field": f, "enrich_fields": [...]}} (the `match` policy
        type; `geo_match`/`range` are out of scope)."""
        if "match" not in policy:
            raise ValueError("only the 'match' policy type is supported")
        m = policy["match"]
        for k in ("indices", "match_field", "enrich_fields"):
            if k not in m:
                raise ValueError(f"match policy needs {k!r}")
        data = self._load()
        if name in data:
            # the reference rejects overwrite (policies are immutable)
            raise ValueError(f"policy [{name}] already exists")
        data[name] = {"policy": policy, "executions": 0}
        self._store(data)
        return {"acknowledged": True}

    def get_policy(self, name: str | None = None) -> dict:
        data = self._load()
        if name is None:
            return {"policies": [
                {"config": {"match": {**v["policy"]["match"],
                                      "name": n}}}
                for n, v in sorted(data.items())]}
        if name not in data:
            raise KeyError(name)
        return {"policies": [{"config": {"match": {
            **data[name]["policy"]["match"], "name": name}}}]}

    def delete_policy(self, name: str) -> dict:
        data = self._load()
        if name not in data:
            raise KeyError(name)
        del data[name]
        self._store(data)
        lp = os.path.join(self.root, f"enrich-{name}.parquet")
        if os.path.exists(lp):
            os.remove(lp)
        return {"acknowledged": True}

    def execute_policy(self, name: str) -> dict:
        """Materialize the policy's lookup table: read ONLY the match
        + enrich columns from the source parquet (column-pruned read),
        last-row-wins per match key, written as one compact parquet
        (the `.enrich-*` system-index snapshot analogue)."""
        data = self._load()
        if name not in data:
            raise KeyError(name)
        m = data[name]["policy"]["match"]
        cols = [m["match_field"], *m["enrich_fields"]]
        t = pq.read_table(m["indices"], columns=cols)
        # last-wins per key (the reference reindexes source order)
        keys = t[m["match_field"]].to_pylist()
        last = {k: i for i, k in enumerate(keys)}
        idx = sorted(last.values())
        out = t.take(pa.array(idx, pa.int64()))
        dest = os.path.join(self.root, f"enrich-{name}.parquet")
        pq.write_table(out, dest)
        data[name]["executions"] += 1
        data[name]["rows"] = out.num_rows
        self._store(data)
        return {"status": {"phase": "COMPLETE"}, "rows": out.num_rows,
                "lookup_path": dest}

    def lookup(self, name: str) -> dict:
        """Load the executed lookup as {match_value: {enrich fields}}
        — the dict the `enrich` ingest processor broadcasts."""
        data = self._load()
        if name not in data:
            raise KeyError(name)
        dest = os.path.join(self.root, f"enrich-{name}.parquet")
        if not os.path.exists(dest):
            raise ValueError(f"policy [{name}] has not been executed")
        m = data[name]["policy"]["match"]
        t = pq.read_table(dest)
        keys = t[m["match_field"]].to_pylist()
        out = {}
        fields = m["enrich_fields"]
        cols = {f: t[f].to_pylist() for f in fields}
        for i, k in enumerate(keys):
            out[k] = {f: cols[f][i] for f in fields}
        return out
