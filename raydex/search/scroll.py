"""Scroll API (``_search?scroll=`` + ``_scroll``) as a PIT cursor.

Reference shape: ``server/src/main/java/org/elasticsearch/action/
search/TransportSearchScrollAction.java`` — a scroll pins a consistent
reader set per shard and pages through the full result set with a
server-held cursor and a renewable ``keep_alive`` lease. The reference
itself documents scroll as superseded by ``search_after`` over a
point-in-time reader (``docs/reference/search/paginate-search-results``
"We no longer recommend using the scroll API"), and that is exactly
the construction here: ``open_scroll`` pins a PIT view
(raydex.search.pit — hardlinked immutable segment set, keep_alive
lease, unaffected by later writes/merges) and each ``scroll`` call is
one ``search_sorted(search_after=cursor)`` page over that view. The
cursor is persisted NEXT TO the pinned view (``scroll.json``), so a
scroll survives the driver process — the id itself stays opaque and
stateless like the reference's.

Ordering: the reference's efficient scroll sorts by ``_doc``; raydex's
analogue is the index's unique ``url`` column (default), with the
(sort_value, ordinal, docid) cursor making pages tile exactly even
under ties. Any stored sort field works via ``sort_field=``.
"""

from __future__ import annotations

import base64
import json
import os

_STATE = "scroll.json"


def _encode(pit_id: str) -> str:
    return base64.urlsafe_b64encode(
        json.dumps({"pit": pit_id}).encode()).decode()


def _decode(scroll_id: str) -> str:
    return json.loads(
        base64.urlsafe_b64decode(scroll_id.encode()).decode())["pit"]


def _cursor_of(hits):
    """(sort_value, ordinal, docid) of the page's last hit, with numpy
    scalars unwrapped so the cursor JSON-serializes."""
    if not hits:
        return None
    h = hits[-1]
    return [v.item() if hasattr(v, "item") else v
            for v in (h["sort_value"], h["ordinal"], h["docid"])]


def open_scroll(index_dir: str, qdict: dict, size: int = 10,
                keep_alive_s: float = 300.0, sort_field: str = "url",
                order: str = "asc") -> dict:
    """Start a scroll: pin the current segment set, return the first
    page. Response shape mirrors the reference: ``_scroll_id`` +
    ``hits`` (each hit a dict with url/sort_value/ordinal/docid)."""
    from raydex.search.pit import open_pit, pit_dir
    from raydex.search.scatter import LocalSearcher

    pit = open_pit(index_dir, keep_alive_s=keep_alive_s)
    sid = _encode(pit)
    view = pit_dir(pit)
    s = LocalSearcher(view)
    hits = s.search_sorted(qdict, sort_field=sort_field, order=order,
                           k=int(size))
    cursor = _cursor_of(hits)
    with open(os.path.join(view, _STATE), "w") as f:
        json.dump({"query": qdict, "size": int(size),
                   "sort_field": sort_field, "order": order,
                   "cursor": cursor, "done": not hits}, f)
    return {"_scroll_id": sid, "hits": hits}


def scroll(scroll_id: str, keep_alive_s: float | None = None) -> dict:
    """Next page; renews the PIT lease when ``keep_alive_s`` is given.
    An exhausted scroll returns ``{"hits": []}`` (the reference's
    empty-hits end-of-stream signal). Raises on an expired/cleared
    scroll, like the reference's SearchContextMissingException."""
    from raydex.search.pit import pit_dir
    from raydex.search.scatter import LocalSearcher

    pit = _decode(scroll_id)
    view = pit_dir(pit, keep_alive_s=keep_alive_s)
    sp = os.path.join(view, _STATE)
    with open(sp) as f:
        st = json.load(f)
    if st.get("done"):
        return {"_scroll_id": scroll_id, "hits": []}
    s = LocalSearcher(view)
    cur = st["cursor"]
    hits = s.search_sorted(
        st["query"], sort_field=st["sort_field"], order=st["order"],
        k=st["size"], search_after=tuple(cur) if cur else None)
    st["cursor"] = _cursor_of(hits) or st["cursor"]
    st["done"] = not hits
    with open(sp, "w") as f:
        json.dump(st, f)
    return {"_scroll_id": scroll_id, "hits": hits}


def clear_scroll(scroll_id: str) -> bool:
    """``DELETE _search/scroll`` — release the pinned view now instead
    of waiting for the lease to lapse."""
    from raydex.search.pit import close_pit

    return close_pit(_decode(scroll_id))
