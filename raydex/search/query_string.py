"""`simple_query_string` mini-grammar (``SimpleQueryStringBuilder``):

    +term      -> bool.must
    -term      -> bool.must_not
    "a b c"    -> match_phrase
    a | b      -> OR group (should)
    bare terms -> should (default OR), AND-able via default_operator

Parsed into the raydex query DSL tree (raydex.search.query), so it
evaluates everywhere the DSL does. Invalid syntax degrades to terms
(the reference's lenient behavior).
"""

from __future__ import annotations

import regex

_TOKEN = regex.compile(r"\"[^\"]*\"|\S+")


def parse_simple_query_string(q: str, default_operator: str = "or") -> dict:
    must, must_not, should = [], [], []
    for raw in _TOKEN.findall(q):
        neg = False
        plus = False
        while raw[:1] in "+-":
            if raw[0] == "+":
                plus = True
            else:
                neg = True
            raw = raw[1:]
        if not raw:
            continue
        if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
            clause = {"match_phrase": {"text": raw[1:-1]}}
        elif "|" in raw:
            clause = {
                "bool": {
                    "should": [
                        {"match": {"text": p}} for p in raw.split("|") if p
                    ]
                }
            }
        else:
            clause = {"match": {"text": raw}}
        if neg:
            must_not.append(clause)
        elif plus or default_operator == "and":
            must.append(clause)
        else:
            should.append(clause)
    body: dict = {}
    if must:
        body["must"] = must
    if must_not:
        body["must_not"] = must_not
    if should:
        body["should"] = should
    if not body:
        return {"match_all": {}}
    return {"bool": body}
