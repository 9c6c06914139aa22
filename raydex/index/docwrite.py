"""Single-document write path — ``PUT _doc`` / ``_update`` / ``DELETE _doc``.

Reference: ``server/src/main/java/org/elasticsearch/action/index/
TransportIndexAction.java`` (single-doc index routed to one shard by
murmur3), ``action/update/TransportUpdateAction.java`` + ``UpdateHelper
.java`` (GET-then-reindex partial update, ``doc_as_upsert``,
``detect_noop``), ``action/delete/TransportDeleteAction.java``, and
``index/engine/InternalEngine.java``: writes land in an in-memory
indexing buffer (Lucene's IndexWriter RAM buffer) and become searchable
only at **refresh**, which cuts a new small segment
(``RefreshListeners.java`` / the ``?refresh=wait_for`` contract).

raydex mapping:

- ``DocWriter`` is the per-index engine buffer. ``index_doc`` /
  ``update_doc`` / ``delete_doc`` mutate only the buffer (plus a
  monotonic ``_seq_no`` persisted in ``write_log.json`` — the
  per-shard sequence-number service, ``SequenceNumbers.java``).
- ``refresh()`` makes the buffer visible: it soft-deletes superseded
  copies (latest-wins, the same contract the bulk build enforces) in
  the ROUTED partitions only — a micro-write never touches the other
  N-1 partitions of a 10^12-doc index — then cuts one micro-segment
  per touched partition with the index's recorded build parameters
  (same analyzer, same field specs, same index sort) and appends it to
  the manifests atomically. Segment ids sort after the bulk-build ids
  (``seg-PPPPP-wNNNN``), keeping the global (part, seg_id) tie-break
  order stable.
- Micro-segments additionally STORE the full source columns the doc
  arrived with (the ``_source``/translog analogue) so point GETs and
  partial updates round-trip. Bulk-build segments intentionally do
  not store text (at corpus scale the source stays in the lineage
  parquet); a partial ``_update`` against such a doc therefore raises
  the ``DocumentSourceMissingException`` analogue exactly like the
  reference does when ``_source`` is disabled (``UpdateHelper.java``).

The buffered path is deliberately driver-local (no Ray tasks): a
single-document write is a latency operation, not a throughput one —
the bulk build remains the scale path, and a refresh touches
O(buffered partitions) segments, never the whole index.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from raydex.index.build import (
    INDEX_MANIFEST,
    PART_MANIFEST,
    _part_dir,
    load_index_manifest,
)
from raydex.index.segment import FieldSpec, build_segment
from raydex.partition import route_partitions

_RESERVED = {"part", "_seg_id", "_docid", "_seq_no"}


class DocumentSourceMissing(KeyError):
    """Partial update against a doc whose source is not stored
    (bulk-built segments) — the reference's
    ``DocumentSourceMissingException``."""


class VersionConflict(ValueError):
    """``op_type=create`` on an existing id — the reference's 409
    ``VersionConflictEngineException``."""


def _seq_path(index_dir: str) -> str:
    return os.path.join(index_dir, "write_log.json")


def _load_log(index_dir: str) -> dict:
    p = _seq_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"seq_no": -1}


def _store_seq(index_dir: str, seq: int, pending: dict | None = None) -> None:
    """Persist the sequence number — and, when ``pending`` is given,
    the buffered operations themselves (the translog analogue:
    ``Translog.java`` journals every op before it reaches Lucene so a
    crash between the soft-delete and the segment append replays
    instead of losing the update)."""
    body: dict = {"seq_no": seq}
    if pending:
        body["pending"] = pending
    tmp = _seq_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(body, f)
    os.replace(tmp, _seq_path(index_dir))


_UPDATE_SCRIPTS: dict = {}


def register_update_script(name: str, fn) -> None:
    """Register a scripted-update callable ``fn(ctx, params)`` — the
    painless ``ctx._source`` contract (mutate ``ctx['_source']`` in
    place; set ``ctx['op']`` to index/delete/none)."""
    _UPDATE_SCRIPTS[name] = fn


def update_script(name: str):
    try:
        return _UPDATE_SCRIPTS[name]
    except KeyError:
        raise ValueError(f"unknown update script {name!r}") from None


# the reference doc examples' counter/tag one-liners
register_update_script(
    "increment_field", lambda ctx, p: ctx["_source"].__setitem__(
        p.get("field", "counter"),
        (ctx["_source"].get(p.get("field", "counter")) or 0)
        + p.get("by", 1)))
register_update_script(
    "delete_if_eq", lambda ctx, p: ctx.__setitem__(
        "op", "delete" if ctx["_source"].get(p["field"]) == p["value"]
        else "none"))


class DocWriter:
    """Buffered single-document writer over a built index."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = load_index_manifest(index_dir)
        with open(os.path.join(index_dir, "build_params.json")) as f:
            self.params = json.load(f)
        self.fields = [FieldSpec.from_json(d)
                       for d in self.params.get("fields") or []]
        self.num_partitions = int(self.params["num_partitions"])
        self.join_spec = next(
            (s for s in self.fields if s.analyzer == "join"), None)
        # url -> full source doc (dict); insertion order irrelevant —
        # the dict itself IS the latest-wins buffer
        self.buffer: dict[str, dict] = {}
        # url -> routing key of the deleted doc (url itself when the
        # index has no join field)
        self.tombstones: dict[str, str] = {}
        log = _load_log(index_dir)
        self._seq = int(log["seq_no"])
        # on-disk existence memo (the live-version-map analogue): a
        # bulk body primes it with ONE routed mget instead of one
        # point-GET per action line
        self._exist_cache: dict[str, bool] = {}
        # translog replay: a crash mid-refresh leaves the journaled ops
        # in write_log.json — restore them into the buffer so the next
        # refresh() completes the interrupted one (soft deletes are
        # idempotent; a half-appended micro-segment's copies get
        # superseded latest-wins by the replayed flush)
        pending = log.get("pending")
        if pending:
            self.buffer.update(pending.get("docs") or {})
            self.tombstones.update(pending.get("tombstones") or {})

    # -- buffer ops ------------------------------------------------------

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    def _doc_routing(self, url: str, doc: dict) -> str:
        """Routing key for a doc we hold: the parent id for join-field
        child docs (``routing ?? _id``), the url otherwise."""
        if self.join_spec is None:
            return url
        from raydex.index.joinfield import join_routing_keys

        vals = pa.array([doc.get(self.join_spec.source)])
        return join_routing_keys(vals, [url])[0]

    def _resolve_routing(self, url: str, routing: str | None) -> str:
        """Routing for an id-only operation (get/update/delete). On a
        join-field index an explicit ``routing`` is REQUIRED unless the
        id resolves via self-routing (i.e. it is a parent / self-routed
        doc) — mirroring the reference's routing-required contract for
        join fields (``ParentJoinFieldMapper``: a child written or
        deleted without routing would silently target the wrong
        shard)."""
        if routing is not None:
            return routing
        if self.join_spec is None:
            return url
        if url in self.buffer:
            return self._doc_routing(url, self.buffer[url])
        if url in self.tombstones:
            return self.tombstones[url]
        # resolvable iff the doc lives in its self-routed partition
        from raydex.search.get import get_doc

        row = get_doc(self.index_dir, url, columns=["url"], routing=url)
        if row is not None:
            self._exist_cache[url] = True
            return url
        raise ValueError(
            f"[{url}]: routing is required on a join-field index — the "
            "id does not resolve via self-routing (child docs live in "
            "their parent's partition; pass routing=<parent id>)")

    def _get_stored(self, url: str, columns=None,
                    routing: str | None = None) -> dict | None:
        from raydex.search.get import get_doc

        row = get_doc(self.index_dir, url, columns=columns,
                      routing=self._resolve_routing(url, routing))
        self._exist_cache[url] = row is not None
        return row

    def _exists_on_disk(self, url: str, routing: str | None = None) -> bool:
        if url in self._exist_cache:
            return self._exist_cache[url]
        return self._get_stored(url, columns=["url"],
                                routing=routing) is not None

    def prime_existence(self, urls: list[str],
                        routing: dict[str, str] | None = None) -> None:
        """Seed the on-disk existence memo with ONE routed mget — the
        bulk path's per-item created/updated resolution then never
        re-opens a partition per action line. ``routing``: optional
        id -> routing-key map (join-field children)."""
        from raydex.search.get import mget

        todo = [u for u in dict.fromkeys(urls)
                if u not in self._exist_cache]
        if not todo:
            return
        keys = [(routing or {}).get(u, u) for u in todo]
        for u, row in zip(todo, mget(self.index_dir, todo,
                                     columns=["url"], routing=keys)):
            self._exist_cache[u] = row is not None

    def index_doc(self, doc: dict, create: bool = False) -> dict:
        """``PUT <index>/_doc/<id>`` (``op_type=index`` default;
        ``create=True`` = ``op_type=create`` → conflict if the id
        exists). ``doc`` must carry ``url`` and the source columns the
        index's build parameters analyze (``text`` — or ``html`` when
        the build extracted — plus every mapped field's source)."""
        url = doc.get("url")
        if not url:
            raise ValueError("doc requires a non-empty 'url' (the _id)")
        routing = self._doc_routing(url, doc)
        exists = (url in self.buffer
                  or (url not in self.tombstones
                      and self._exists_on_disk(url, routing=routing)))
        if create and exists:
            raise VersionConflict(
                f"[{url}]: version conflict, document already exists")
        self._check_source(doc)
        self.buffer[url] = dict(doc)
        self.tombstones.pop(url, None)
        return {"_id": url, "result": "updated" if exists else "created",
                "_seq_no": self._next_seq()}

    def _check_source(self, doc: dict) -> None:
        need = ["html"] if self.params.get("source") == "html" else ["text"]
        if self.params.get("source") == "verify":
            need = ["html", "text"]
        for spec in self.fields:
            if spec.analyzer == "alias":
                continue
            srcs = (spec.source if isinstance(spec.source, (list, tuple))
                    else [spec.source])
            need.extend(srcs)
        if self.params.get("index_sort"):
            need.append(self.params["index_sort"][0])
        missing = [c for c in dict.fromkeys(need) if c not in doc]
        if missing:
            raise ValueError(
                f"doc is missing required source columns {missing} "
                f"(build params demand them)")

    def update_doc(self, url: str, doc: dict | None = None,
                   doc_as_upsert: bool = False, upsert: dict | None = None,
                   detect_noop: bool = True,
                   script: dict | None = None,
                   routing: str | None = None) -> dict:
        """``POST <index>/_update/<id>``: GET-then-merge-then-reindex
        (``UpdateHelper.prepare``). ``doc`` is the partial source;
        ``doc_as_upsert``/``upsert`` supply the create path when the id
        is absent. ``detect_noop`` returns ``result='noop'`` when the
        merge changes nothing (reference default true).

        ``script``: the scripted-update form — ``{"source":
        <registered name or callable>, "params": {...}}`` run against
        ``ctx = {"_source": {...}, "op": "index"}`` exactly like the
        reference's painless ``ctx._source`` contract; the script may
        mutate ``_source`` in place and set ``ctx["op"]`` to
        ``"index"`` (reindex), ``"delete"`` (tombstone) or ``"none"``
        (noop). Scripts resolve through the engine-wide Python
        registry convention (``register_update_script``). Mutually
        exclusive with ``doc`` (the reference rejects both too)."""
        if script is not None:
            if doc:
                raise ValueError(
                    "update requires either 'doc' or 'script', not both")
            return self._scripted_update(url, script, upsert,
                                         routing=routing)
        doc = dict(doc or {})
        current = self.buffer.get(url)
        if current is None and url not in self.tombstones:
            stored = self._get_stored(url, routing=routing)
            if stored is not None:
                if not stored.get("_stored_source"):
                    raise DocumentSourceMissing(
                        f"[{url}]: document source missing — the doc "
                        "was bulk-built without stored source (the "
                        "reference's DocumentSourceMissingException "
                        "when _source is disabled)")
                current = {k: v for k, v in stored.items()
                           if k not in _RESERVED
                           and k not in ("dl", "norm", "_stored_source")}
        if current is None:
            if doc_as_upsert:
                merged = dict(doc)
                merged.setdefault("url", url)
            elif upsert is not None:
                merged = dict(upsert)
                merged.setdefault("url", url)
            else:
                raise KeyError(f"[{url}]: document missing")
            self._check_source(merged)
            self.buffer[url] = merged
            self.tombstones.pop(url, None)
            return {"_id": url, "result": "created",
                    "_seq_no": self._next_seq()}
        merged = {**current, **doc, "url": url}
        if detect_noop and all(current.get(k) == v for k, v in doc.items()):
            return {"_id": url, "result": "noop", "_seq_no": self._seq}
        self._check_source(merged)
        self.buffer[url] = merged
        return {"_id": url, "result": "updated",
                "_seq_no": self._next_seq()}

    def _scripted_update(self, url: str, script: dict,
                         upsert: dict | None,
                         routing: str | None = None) -> dict:
        fn = script.get("source")
        if not callable(fn):
            fn = update_script(str(fn))
        params = dict(script.get("params") or {})
        current = self.buffer.get(url)
        if current is None and url not in self.tombstones:
            stored = self._get_stored(url, routing=routing)
            if stored is not None:
                if not stored.get("_stored_source"):
                    raise DocumentSourceMissing(
                        f"[{url}]: document source missing")
                current = {k: v for k, v in stored.items()
                           if k not in _RESERVED
                           and k not in ("dl", "norm", "_stored_source")}
        if current is None:
            if upsert is None:
                raise KeyError(f"[{url}]: document missing")
            # reference semantics: the upsert doc is indexed as-is;
            # the script does NOT run on it (scripted_upsert=false)
            merged = dict(upsert)
            merged.setdefault("url", url)
            self._check_source(merged)
            self.buffer[url] = merged
            self.tombstones.pop(url, None)
            return {"_id": url, "result": "created",
                    "_seq_no": self._next_seq()}
        ctx = {"_source": dict(current), "op": "index"}
        fn(ctx, params)
        if ctx["op"] == "none":
            return {"_id": url, "result": "noop", "_seq_no": self._seq}
        if ctx["op"] == "delete":
            return self.delete_doc(url, routing=routing)
        if ctx["op"] != "index":
            raise ValueError(f"script set unknown ctx.op {ctx['op']!r}")
        merged = {**ctx["_source"], "url": url}
        self._check_source(merged)
        self.buffer[url] = merged
        return {"_id": url, "result": "updated",
                "_seq_no": self._next_seq()}

    def delete_doc(self, url: str, routing: str | None = None) -> dict:
        """``DELETE <index>/_doc/<id>``. On a join-field index the
        routing key is required unless the id self-routes (see
        ``_resolve_routing``)."""
        buffered = self.buffer.pop(url, None)
        rkey = self._resolve_routing(url, routing)
        on_disk = self._exists_on_disk(url, routing=rkey)
        if on_disk:
            self.tombstones[url] = rkey
        if buffered is None and not on_disk:
            return {"_id": url, "result": "not_found", "_seq_no": self._seq}
        return {"_id": url, "result": "deleted", "_seq_no": self._next_seq()}

    def get(self, url: str, columns=None,
            routing: str | None = None) -> dict | None:
        """Realtime GET (``TransportGetAction`` ``realtime=true``):
        reads the writer's buffer — the translog read — before
        falling back to segments, so a just-indexed doc is fetchable
        BEFORE refresh even though it is not yet searchable."""
        if url in self.tombstones:
            return None
        if url in self.buffer:
            row = dict(self.buffer[url])
            return ({k: row[k] for k in columns if k in row}
                    if columns else row)
        return self._get_stored(url, columns=columns, routing=routing)

    # -- refresh: make the buffer searchable ------------------------------

    def refresh(self) -> dict:
        """Cut one micro-segment per buffered partition + apply
        tombstones. Touches only routed partitions. Returns
        ``{"segments": n, "docs": n, "deleted": n}``.

        Crash-safety order (the translog contract): (1) journal the
        buffered ops into write_log.json, (2) cut + append the NEW
        micro-segments, (3) soft-delete the superseded copies in the
        pre-existing segments only. A crash at any point loses nothing:
        before (2) the journal replays on the next DocWriter open;
        between (2) and (3) the index holds a recoverable duplicate
        that the replayed refresh's delete pass resolves latest-wins."""
        if not self.buffer and not self.tombstones:
            _store_seq(self.index_dir, self._seq)
            return {"segments": 0, "docs": 0, "deleted": 0}
        try:
            _store_seq(self.index_dir, self._seq,
                       pending={"docs": self.buffer,
                                "tombstones": self.tombstones})
        except TypeError:
            # non-JSON-serializable source values: skip the journal
            # (the append-before-delete order below still guarantees
            # no loss, only a transient duplicate on crash)
            pass
        kill_routing = {u: self._doc_routing(u, d)
                        for u, d in self.buffer.items()}
        kill_routing.update(self.tombstones)
        new_rows = self._flush_segments() if self.buffer else []
        if new_rows:
            _append_manifest_rows(self.index_dir, new_rows)
            self.manifest = load_index_manifest(self.index_dir)
        kill = sorted(kill_routing)
        deleted = _delete_ids_routed(
            self.index_dir, kill, self.num_partitions,
            routing=[kill_routing[u] for u in kill],
            exclude_segs={r["seg_id"] for r in new_rows})
        for u in self.buffer:
            self._exist_cache[u] = True
        for u in self.tombstones:
            self._exist_cache[u] = False
        self.buffer.clear()
        self.tombstones.clear()
        _store_seq(self.index_dir, self._seq)
        return {"segments": len(new_rows),
                "docs": int(sum(r["doc_count"] for r in new_rows)),
                "deleted": deleted}

    def _routing_keys(self, urls: list[str], docs: list[dict]) -> list[str]:
        join_specs = [s for s in self.fields if s.analyzer == "join"]
        if not join_specs:
            return urls
        from raydex.index.joinfield import join_routing_keys

        src = join_specs[0].source
        vals = pa.array([d.get(src) for d in docs])
        return join_routing_keys(vals, urls)

    def _flush_segments(self) -> list[dict]:
        from raydex.analysis.html_strip import extract_text_many

        urls = sorted(self.buffer)
        docs = [self.buffer[u] for u in urls]
        parts = route_partitions(self._routing_keys(urls, docs),
                                 self.num_partitions)
        by_part: dict[int, list[int]] = {}
        for i, p in enumerate(parts):
            by_part.setdefault(int(p), []).append(i)
        rows = []
        for p in sorted(by_part):
            idxs = by_part[p]  # url-ascending (urls sorted)
            p_urls = [urls[i] for i in idxs]
            p_docs = [docs[i] for i in idxs]
            src_mode = self.params.get("source", "text")
            if src_mode in ("html", "verify"):
                texts = extract_text_many(
                    [d.get("html", b"") for d in p_docs])
                if src_mode == "verify":
                    for u, got, d in zip(p_urls, texts, p_docs):
                        if got != d.get("text"):
                            raise ValueError(
                                f"extracted text != text column for "
                                f"url={u!r}")
            else:
                texts = [str(d.get("text") or "") for d in p_docs]
            isort = self.params.get("index_sort")
            order = list(range(len(p_urls)))
            if isort:
                sf, sdir = isort
                # None-safe sort key (missing values sort last, the
                # reference's missing:_last default); mixed
                # incomparable types are a mapping violation
                try:
                    order.sort(
                        key=lambda i: (p_docs[i].get(sf) is None,
                                       p_docs[i].get(sf)),
                        reverse=(sdir == "desc"))
                except TypeError:
                    bad = sorted({type(p_docs[i].get(sf)).__name__
                                  for i in order})
                    raise ValueError(
                        f"index-sort field {sf!r} holds mutually "
                        f"incomparable value types {bad}") from None
                p_urls = [p_urls[i] for i in order]
                p_docs = [p_docs[i] for i in order]
                texts = [texts[i] for i in order]
            extra_fields = []
            for spec in self.fields:
                if spec.analyzer == "alias":
                    extra_fields.append((spec, None))
                    continue
                if isinstance(spec.source, (list, tuple)):
                    vals = pa.array(
                        [" ".join(str(d.get(c) or "") for c in spec.source)
                         for d in p_docs], type=pa.large_string())
                else:
                    vals = pa.array([d.get(spec.source) for d in p_docs])
                extra_fields.append((spec, vals))
            # stored source: every non-reserved doc column except the
            # primary text inputs already stored elsewhere
            dv: dict[str, pa.Array] = {}
            src_cols = sorted(
                {k for d in p_docs for k in d} - _RESERVED
                - {"url", "dl", "norm", "_stored_source"})
            for c in src_cols:
                dv[c] = pa.array([d.get(c) for d in p_docs])
            dv["_stored_source"] = pa.array([True] * len(p_docs))
            part_dir = _part_dir(self.index_dir, p)
            os.makedirs(part_dir, exist_ok=True)
            n = sum(1 for r in self.manifest["segments"]
                    if r["part"] == p and "-w" in r["seg_id"])
            while True:
                seg_id = f"seg-{p:05d}-w{n:04d}"
                if not os.path.exists(os.path.join(part_dir, seg_id)):
                    break
                n += 1
            m = build_segment(
                os.path.join(part_dir, seg_id),
                p_urls,
                pa.array(texts, type=pa.large_string()),
                analyzer=self.params["analyzer"],
                input_fragments=["<doc-writes>"],
                seg_id=seg_id,
                store_positions=bool(self.params.get("store_positions")),
                extra_fields=extra_fields,
                doc_values=dv or None,
                index_sort=tuple(isort) if isort else None,
            )
            rows.append(_manifest_row(p, seg_id, m))
        return rows


def _manifest_row(p: int, seg_id: str, m: dict) -> dict:
    """The same row shape ``_BuildPartition`` appends (build.py:244)."""
    return {
        "part": int(p),
        "seg_id": seg_id,
        "doc_count": m["doc_count"],
        "sum_dl": m["sum_dl"],
        "term_count": m["term_count"],
        "max_df": m["max_df"],
        "content_hash": m["content_hash"],
        "field_sum_dl": json.dumps(
            {f: fm["sum_dl"] for f, fm in m.get("fields", {}).items()}),
        "field_extra": json.dumps(
            {f: ({"dims": fm.get("dims", 0),
                  "similarity": fm.get("similarity", "cosine")}
                 if fm.get("kind") == "dense_vector"
                 else {"value_count": fm.get("value_count", 0),
                       "sum_ln": fm.get("sum_ln", 0.0),
                       "positive_count": fm.get("positive_count", 0)})
             for f, fm in m.get("fields", {}).items()
             if fm.get("kind") in ("rank_feature", "dense_vector")}),
    }


def _append_manifest_rows(index_dir: str, new_rows: list[dict]) -> None:
    """Append micro-segment rows + recompute global totals (same law as
    compact.py's manifest rewrite), atomically; keep each touched
    partition's ``partition_manifest.json`` consistent for resume."""
    m = load_index_manifest(index_dir)
    rows = list(m["segments"]) + new_rows
    rows.sort(key=lambda r: (r["part"], r["seg_id"]))
    field_sum_dl: dict[str, int] = {}
    field_extra: dict[str, dict] = {}
    for r in rows:
        for f, v in json.loads(r.get("field_sum_dl") or "{}").items():
            field_sum_dl[f] = field_sum_dl.get(f, 0) + int(v)
        for f, fx in json.loads(r.get("field_extra") or "{}").items():
            if "dims" in fx:
                field_extra[f] = fx
            else:
                acc = field_extra.setdefault(
                    f, {"value_count": 0, "sum_ln": 0.0,
                        "positive_count": 0})
                acc["value_count"] += int(fx.get("value_count", 0))
                acc["sum_ln"] += float(fx.get("sum_ln", 0.0))
                acc["positive_count"] += int(fx.get("positive_count", 0))
    m.update(
        doc_count=int(sum(r["doc_count"] for r in rows)),
        sum_dl=int(sum(r["sum_dl"] for r in rows)),
        segments=rows,
    )
    for fname, meta in (m.get("fields") or {}).items():
        meta = dict(meta)
        meta["sum_dl"] = field_sum_dl.get(fname, 0)
        meta.update(field_extra.get(fname, {}))
        m["fields"][fname] = meta
    for p in sorted({r["part"] for r in new_rows}):
        pdir = _part_dir(index_dir, p)
        prow = [r for r in rows if r["part"] == p]
        pm_path = os.path.join(pdir, PART_MANIFEST)
        pm = {}
        if os.path.exists(pm_path):
            with open(pm_path) as f:
                pm = json.load(f)
        pm.update(
            partition_id=int(p),
            segment_ids=[r["seg_id"] for r in prow],
            doc_count=int(sum(r["doc_count"] for r in prow)),
            sum_dl=int(sum(r["sum_dl"] for r in prow)),
            term_count=int(sum(r["term_count"] for r in prow)),
            max_df=int(max((r["max_df"] for r in prow), default=0)),
            content_hash="|".join(r["content_hash"] for r in prow),
            status="complete",
        )
        pm.setdefault("input_fragments", [])
        tmp = pm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(pm, f)
        os.replace(tmp, pm_path)
    tmp = os.path.join(index_dir, INDEX_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, INDEX_MANIFEST))


def _delete_ids_routed(index_dir: str, urls: list[str],
                       num_partitions: int,
                       routing: list[str] | None = None,
                       exclude_segs: set | None = None) -> int:
    """Soft-delete ids touching ONLY their routed partitions' segments
    — a micro-write against a 10^12-doc index opens O(touched
    partitions) segments, not the whole index (delete_by_query's global
    sweep stays the query-form path). ``routing``: per-id routing keys
    (join-field children live in the parent's partition);
    ``exclude_segs``: seg_ids to skip (the just-appended micro-segments
    whose fresh copies must stay live)."""
    if not urls:
        return 0
    from raydex.index.blocks import check_write
    from raydex.index.deletes import _segment_delete, _segment_stats
    from raydex.search.scatter import SearcherBase

    check_write(index_dir)
    keys = routing if routing is not None else urls
    parts = {int(p) for p in route_partitions(keys, num_partitions)}
    s = SearcherBase(index_dir)
    tags = {f"part={p:05d}" for p in parts}
    seg_dirs = [d for d in s.seg_dirs
                if os.path.basename(os.path.dirname(d)) in tags
                and os.path.basename(d) not in (exclude_segs or ())]
    qdict = {"ids": {"values": list(urls)}}
    terms, fpairs = s._collect_stats_spec(qdict)
    df = dict.fromkeys(terms, 0)
    fdf: dict = {tuple(p): 0 for p in fpairs}
    for d in seg_dirs:
        pdf, pfdf = _segment_stats(d, terms, fpairs)
        for t, v in pdf.items():
            df[t] += v
        for k, v in pfdf.items():
            fdf[k] += v
    args = (qdict, s.ndocs, s.sum_dl, df, s.manifest["analyzer"],
            fdf, s.field_sum_dl)
    return int(sum(_segment_delete(d, *args) for d in seg_dirs))


# -- one-shot conveniences (the REST verb surface) -------------------------

def index_doc(index_dir: str, doc: dict, create: bool = False,
              refresh: bool = True) -> dict:
    """``PUT <index>/_doc/<id>?refresh=true`` one-shot."""
    w = DocWriter(index_dir)
    r = w.index_doc(doc, create=create)
    if refresh:
        w.refresh()
    return r


def update_doc(index_dir: str, url: str, doc: dict | None = None,
               doc_as_upsert: bool = False, upsert: dict | None = None,
               detect_noop: bool = True, refresh: bool = True,
               script: dict | None = None,
               routing: str | None = None) -> dict:
    """``POST <index>/_update/<id>?refresh=true`` one-shot."""
    w = DocWriter(index_dir)
    r = w.update_doc(url, doc=doc, doc_as_upsert=doc_as_upsert,
                     upsert=upsert, detect_noop=detect_noop,
                     script=script, routing=routing)
    if refresh:
        w.refresh()
    return r


def delete_doc(index_dir: str, url: str, refresh: bool = True,
               routing: str | None = None) -> dict:
    """``DELETE <index>/_doc/<id>?refresh=true`` one-shot."""
    w = DocWriter(index_dir)
    r = w.delete_doc(url, routing=routing)
    if refresh:
        w.refresh()
    return r


# -- _bulk wire format ------------------------------------------------------

_BULK_OPS = ("index", "create", "update", "delete")


def bulk_apply(index_dir: str, body, refresh: bool = True) -> dict:
    """``POST _bulk`` over an existing index: the reference's NDJSON
    action-line format (``TransportBulkAction.java`` /
    ``BulkRequestParser.java``) — an action metadata line
    (``{"index"|"create"|"update"|"delete": {"_id": ...}}``) followed,
    except for delete, by the source line (for update: ``{"doc": ...,
    "doc_as_upsert": ..., "upsert": ...}``). Per-item error isolation
    (BulkItemResponse): one bad item never fails the request. One
    refresh at the end makes the whole batch visible atomically per
    partition.

    ``body``: an iterable of JSON strings/dicts or a path to an NDJSON
    file. Returns ``{"errors": bool, "items": [...]}`` with
    reference-style per-item status codes (201 created / 200 ok /
    404 not_found / 409 conflict / 400 bad action).

    The INITIAL corpus load stays with ``build_index`` (the Ray Data
    throughput path — raydex's `_bulk` NDJSON reader); this is the
    incremental maintenance form.
    """
    if isinstance(body, str):
        with open(body) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
    else:
        lines = [ln for ln in body
                 if (ln.strip() if isinstance(ln, str) else True)]
    w = DocWriter(index_dir)
    # ONE routed mget resolves every item's created/updated status —
    # never a per-action partition read
    ids = []
    id_routing: dict[str, str] = {}
    for ln in lines:
        try:
            d = json.loads(ln) if isinstance(ln, str) else ln
        except Exception:
            continue
        if isinstance(d, dict) and len(d) == 1:
            op0 = next(iter(d))
            if op0 in _BULK_OPS and isinstance(d[op0], dict) \
                    and d[op0].get("_id"):
                ids.append(d[op0]["_id"])
                if d[op0].get("routing"):
                    id_routing[d[op0]["_id"]] = d[op0]["routing"]
    w.prime_existence(ids, routing=id_routing or None)
    items: list[dict] = []
    i = 0
    while i < len(lines):
        raw = lines[i]
        i += 1
        try:
            action = json.loads(raw) if isinstance(raw, str) else raw
            if (not isinstance(action, dict) or len(action) != 1
                    or next(iter(action)) not in _BULK_OPS):
                raise ValueError(
                    f"expected one of {_BULK_OPS} as the action key, "
                    f"got {action!r}")
        except Exception as e:  # malformed action line: hard error —
            # the reference aborts parsing here too (can't resync)
            raise ValueError(f"malformed bulk action line {i}: {e}") from e
        op = next(iter(action))
        meta = action[op] or {}
        src = None
        if op != "delete":
            if i >= len(lines):
                raise ValueError(f"bulk action {op!r} at line {i} has "
                                 "no source line")
            raw_src = lines[i]
            i += 1
            src = (json.loads(raw_src) if isinstance(raw_src, str)
                   else dict(raw_src))
        _id = meta.get("_id")
        try:
            if op in ("index", "create"):
                doc = dict(src)
                if _id:
                    doc.setdefault("url", _id)
                r = w.index_doc(doc, create=(op == "create"))
                status = 201 if r["result"] == "created" else 200
            elif op == "update":
                if not _id:
                    raise ValueError("update requires _id")
                r = w.update_doc(
                    _id, doc=src.get("doc"),
                    doc_as_upsert=bool(src.get("doc_as_upsert")),
                    upsert=src.get("upsert"),
                    detect_noop=bool(src.get("detect_noop", True)),
                    script=src.get("script"),
                    routing=meta.get("routing"))
                status = 201 if r["result"] == "created" else 200
            else:
                if not _id:
                    raise ValueError("delete requires _id")
                r = w.delete_doc(_id, routing=meta.get("routing"))
                status = 404 if r["result"] == "not_found" else 200
            items.append({op: {**r, "status": status}})
        except VersionConflict as e:
            items.append({op: {"_id": _id, "status": 409,
                               "error": str(e)}})
        except (DocumentSourceMissing, KeyError) as e:
            items.append({op: {"_id": _id, "status": 404,
                               "error": str(e)}})
        except Exception as e:
            items.append({op: {"_id": _id, "status": 400,
                               "error": str(e)}})
    if refresh:
        w.refresh()
    return {"errors": any(v.get("status", 200) >= 300
                          for it in items for v in it.values()),
            "items": items}
