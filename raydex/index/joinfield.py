"""Parent/child ``join`` field — index-time structures.

The reference's parent-join module (``modules/parent-join/src/main/
java/org/elasticsearch/join/mapper/ParentJoinFieldMapper.java``) adds
two structures per document: the relation NAME as a sorted doc-value,
and a ``join#<parent>`` field (``ParentIdFieldMapper.java``) holding
the parent id — the child's declared parent, or, on a parent document,
its own ``_id``. Children MUST be routed by their parent id so every
parent lives in the same shard as all of its children (the
``routing`` requirement ``HasChildQueryBuilder`` relies on; raydex
derives it automatically at build time instead of requiring the
caller to pass ``routing=``, see :func:`join_routing_keys`).

raydex stores both structures in one doc-aligned sidecar
``field=<name>/join.parquet`` (columns ``name``, ``parent_id``) — the
query side (:mod:`raydex.search.joinquery`) evaluates
``has_child``/``has_parent`` as an explicit per-partition two-phase
join, the scatter analogue of Lucene ``JoinUtil.createJoinQuery`` over
global ordinals.

Only ONE join field may exist per index (the reference enforces the
same in ``ParentJoinFieldMapper``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def parse_join_column(values) -> tuple[list, list]:
    """Decode a join source column into ``(names, parents)`` lists.

    Accepts an Arrow array (or ChunkedArray) of
    - struct rows ``{name: str, parent: str | null}``,
    - JSON strings ``{"name": ..., "parent": ...}``,
    - bare relation-name strings (a parent doc, the reference's
      shorthand ``"join_field": "question"``),
    - nulls (doc takes no part in the join).
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if pa.types.is_struct(values.type):
        names = values.field("name").to_pylist()
        parents = (
            values.field("parent").to_pylist()
            if "parent" in [f.name for f in values.type]
            else [None] * len(values)
        )
        return names, parents
    names: list = []
    parents: list = []
    for v in values.to_pylist():
        if v is None:
            names.append(None)
            parents.append(None)
            continue
        s = str(v)
        if s.startswith("{"):
            d = json.loads(s)
            names.append(d.get("name"))
            parents.append(d.get("parent"))
        else:
            names.append(s)
            parents.append(None)
    return names, parents


def join_routing_keys(values, urls) -> list[str]:
    """Routing key per doc: the declared parent id for child docs, the
    doc's own id otherwise — the ``routing ?? _id`` contract that
    co-locates a parent with all of its children in one partition."""
    _, parents = parse_join_column(values)
    return [p if p is not None else u for p, u in zip(parents, urls)]


def validate_relations(relations: dict) -> dict:
    """Check the relations map ``{parent: [child, ...]}`` (the mapper's
    ``relations`` parameter). Multi-level trees (a child that is itself
    a parent) are REJECTED: the reference supports them only with
    manual ``routing`` by the ROOT ancestor on every level, which
    raydex's automatic parent-or-self routing cannot derive (a
    grandchild would route by its parent's id while that parent routes
    by the grandparent's — different partitions)."""
    if not relations:
        raise ValueError("join field requires a non-empty relations map")
    out = {p: ([k] if isinstance(k, str) else list(k))
           for p, k in relations.items()}
    all_children = {k for kids in out.values() for k in kids}
    for p, kids in out.items():
        if p in kids:
            raise ValueError(f"join relation {p!r} is its own parent")
        if p in all_children:
            raise ValueError(
                f"multi-level join relations are not supported: {p!r} is "
                f"both a parent and a child (the reference requires "
                f"manual root-ancestor routing for these; raydex routes "
                f"automatically by parent-or-self)"
            )
    return out


def parent_relation_of(relations: dict, child_type: str) -> str | None:
    for p, kids in relations.items():
        if child_type in kids:
            return p
    return None


def build_join_field(fdir: str, spec, values, urls: list[str]) -> dict:
    """Write the ``join.parquet`` sidecar for one segment and return the
    field meta (stored in the segment manifest's ``fields`` map)."""
    relations = validate_relations(spec.relations or {})
    names, parents = parse_join_column(values)
    known = set(relations) | {k for kids in relations.values() for k in kids}
    parent_ids: list = []
    for n, p, u in zip(names, parents, urls):
        if n is None:
            parent_ids.append(None)
            continue
        if n not in known:
            raise ValueError(
                f"unknown join relation {n!r}; relations = {relations}"
            )
        if n in relations and p is not None:
            raise ValueError(
                f"parent relation {n!r} must not declare a parent id"
            )
        if p is None and n not in relations:
            raise ValueError(f"child relation {n!r} requires a parent id")
        # ParentIdFieldMapper: parents carry their OWN id
        parent_ids.append(p if p is not None else u)
    os.makedirs(fdir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "name": pa.array(names, pa.string()),
                "parent_id": pa.array(parent_ids, pa.string()),
            }
        ),
        os.path.join(fdir, "join.parquet"),
    )
    njoin = sum(1 for n in names if n is not None)
    return {
        "kind": "join",
        "analyzer": "join",
        "source": spec.source,
        "relations": relations,
        "join_doc_count": int(njoin),
        "sum_dl": 0,  # doc-values structure: no token lengths
    }


def read_join_field(seg_dir: str, name: str):
    """(names, parent_ids) UNICODE ndarrays, doc-aligned; null rows
    (docs outside the join) become '' — no real relation name or parent
    id is empty, so vectorized equality stays exact while comparisons
    run at numpy speed (object arrays were a per-query constant
    factor)."""
    t = pq.read_table(os.path.join(seg_dir, f"field={name}", "join.parquet"))
    names = np.asarray(
        [x if x is not None else "" for x in t["name"].to_pylist()], dtype=str
    )
    pids = np.asarray(
        [x if x is not None else "" for x in t["parent_id"].to_pylist()],
        dtype=str,
    )
    return names, pids
