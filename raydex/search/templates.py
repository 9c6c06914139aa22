"""Search templates + stored scripts — the reference's
``_scripts/<id>`` store (``ClusterState`` StoredScriptsMetadata,
``action/admin/cluster/storedscripts``) and the mustache search
template (``modules/lang-mustache``, `_search/template` /
`_render/template`).

Template grammar kept to the documented core:

- ``{{param}}``   — scalar substitution (string/number/bool);
- ``{{#toJson}}param{{/toJson}}`` — JSON-encode a whole value (lists /
  dicts), the reference's documented escape hatch for arrays;
- ``{{param}}{{^param}}default{{/param}}`` — default when the param is
  absent (the reference's inverted-section default idiom).

Rendering happens on the JSON SOURCE text (exactly like the reference,
which renders mustache over the raw body then parses), so a template
can parameterize keys, values, or whole subtrees.
"""

from __future__ import annotations

import json
import os
import re


_TOJSON_RE = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_DEFAULT_RE = re.compile(
    r"\{\{(\w+)\}\}\{\{\^\1\}\}(.*?)\{\{/\1\}\}", re.S
)
_VAR_RE = re.compile(r"\{\{(\w+)\}\}")


def render_template(source, params: dict | None = None) -> dict:
    """Render a search template to a query body dict. ``source`` is the
    template JSON text (or a dict, serialized first — placeholder
    strings survive json.dumps)."""
    params = params or {}
    text = source if isinstance(source, str) else json.dumps(source)

    def _tojson(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"missing template param {name!r}")
        out = json.dumps(params[name])
        # placeholder may sit inside a JSON string ("{{#toJson}}x{{/toJson}}")
        return out

    def _default(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        return _scalar(params[name]) if name in params else default

    def _var(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"missing template param {name!r}")
        return _scalar(params[name])

    def _scalar(v) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        return str(v)

    text = _TOJSON_RE.sub(_tojson, text)
    text = _DEFAULT_RE.sub(_default, text)
    text = _VAR_RE.sub(_var, text)
    # a toJson expansion inside a quoted string ("\"[1, 2]\"") must
    # become the bare JSON value — unquote such spans
    text = re.sub(r'"(\[.*?\]|\{[^{].*?\})"', lambda m: m.group(1)
                  if _is_json(m.group(1)) else m.group(0), text)
    return json.loads(text)


def _is_json(s: str) -> bool:
    try:
        json.loads(s)
        return True
    except Exception:
        return False


class ScriptStore:
    """Stored scripts/templates keyed by id (`PUT _scripts/<id>`), one
    JSON file under a registry root, atomic writes — the cluster-state
    store analogue."""

    FILE = "scripts.json"

    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, self.FILE)

    def _load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def put(self, script_id: str, source, lang: str = "mustache") -> None:
        data = self._load()
        data[script_id] = {
            "lang": lang,
            "source": source if isinstance(source, str) else json.dumps(source),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def get(self, script_id: str) -> dict:
        data = self._load()
        if script_id not in data:
            raise KeyError(f"stored script not found: {script_id!r}")
        return data[script_id]

    def delete(self, script_id: str) -> None:
        data = self._load()
        data.pop(script_id, None)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def render(self, script_id: str, params: dict | None = None) -> dict:
        """`_render/template` with a stored id."""
        return render_template(self.get(script_id)["source"], params)


def search_template(searcher, source_or_id, params: dict | None = None,
                    k: int = 10, store: ScriptStore | None = None):
    """`_search/template`: render then run. ``source_or_id`` is an
    inline template (str/dict) or, with ``store``, a stored script id.
    The rendered body's ``query`` subtree feeds search_query; a rendered
    ``size`` overrides k (the reference's template-controls-paging)."""
    if store is not None and isinstance(source_or_id, str) and not \
            source_or_id.lstrip().startswith("{"):
        body = store.render(source_or_id, params)
    else:
        body = render_template(source_or_id, params)
    q = body.get("query", body)
    size = int(body.get("size", k))
    return searcher.search_query(q, k=size)
