"""`query_string` / `simple_query_string` grammars.

`parse_query_string` implements the rank-relevant core of the Lucene
query-parser grammar the reference exposes via
``QueryStringQueryBuilder.java:1``:

    field:term            field-qualified leaf (text / url)
    a AND b, a && b       conjunction
    a OR b, a || b        disjunction (also the implicit default)
    NOT a, -a             negation; +a required
    (a OR b) AND c        grouping
    "a b c"               phrase; field:"a b"
    term^2, "a b"^3       boosts
    wild*card, wi?d       wildcard / trailing-* prefix
    fuzzy~1               fuzziness

Parsed into the raydex query DSL tree. AND binds tighter than OR, as
in Lucene. Unsupported syntax degrades leniently to a term (the
reference's ``lenient`` behavior).

`simple_query_string` mini-grammar (``SimpleQueryStringBuilder``):

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


# ------------------------------------------------------- query_string

_QS_TOKEN = regex.compile(
    r"""\(|\)|"[^"]*"(?:\^[0-9.]+)?|\|\||&&|[^\s()]+""", regex.VERBOSE
)


def _lex(q: str) -> list[str]:
    return _QS_TOKEN.findall(q)


class _QSParser:
    """Recursive-descent parser over the lexed token stream.

    Grammar (AND > OR, Lucene precedence):
        or_expr  := and_expr ((OR | '||') and_expr)*
        and_expr := unary ((AND | '&&') unary)*   # implicit op = default
        unary    := ('+' | '-' | NOT)* primary
        primary  := '(' or_expr ')' | phrase | leaf
    """

    def __init__(self, tokens: list[str], default_field: str, default_operator: str):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.default_op = default_operator.lower()

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # -- leaf construction -------------------------------------------
    def _leaf(self, raw: str, fld: str):
        from raydex.search.query import Fuzzy, Match, MatchPhrase, Prefix, Term, Wildcard

        boost = 1.0
        m = regex.match(r"^(.*)\^([0-9.]+)$", raw)
        if m:
            raw, boost = m.group(1), float(m.group(2))
        if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
            return MatchPhrase(text=raw[1:-1], boost=boost)
        m = regex.match(r"^(.*)~([0-9]*)$", raw)
        if m and m.group(1):
            fz = int(m.group(2)) if m.group(2) else 2
            return Fuzzy(value=m.group(1).lower(), fuzziness=fz, boost=boost)
        if "*" in raw or "?" in raw:
            if raw.endswith("*") and "*" not in raw[:-1] and "?" not in raw:
                return Prefix(value=raw[:-1].lower(), boost=boost)
            return Wildcard(pattern=raw.lower(), boost=boost)
        if fld == "text":
            return Match(text=raw, boost=boost)
        return Term(value=raw.lower(), fld=fld, boost=boost)

    # -- grammar ------------------------------------------------------
    def parse(self):
        from raydex.search.query import MatchAll

        node = self.or_expr()
        return node if node is not None else MatchAll()

    def or_expr(self):
        from raydex.search.query import Bool

        parts = [self.and_expr()]
        while self.peek() is not None and self.peek().upper() in ("OR", "||"):
            self.next()
            parts.append(self.and_expr())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return Bool(should=tuple(parts))

    def and_expr(self):
        from raydex.search.query import Bool

        musts, must_nots, shoulds = [], [], []
        explicit_and = False
        pending = self.unary()
        clauses = [pending] if pending else []
        while True:
            nxt = self.peek()
            if nxt is None or nxt == ")" or nxt.upper() in ("OR", "||"):
                break
            if nxt.upper() in ("AND", "&&"):
                self.next()
                explicit_and = True
                nxt = self.peek()
                if nxt is None or nxt == ")":
                    break
            u = self.unary()
            if u is not None:
                clauses.append(u)
        if not clauses:
            return None
        op_and = explicit_and or self.default_op == "and"
        for sign, node in clauses:
            if sign == "-":
                must_nots.append(node)
            elif sign == "+" or op_and:
                musts.append(node)
            else:
                shoulds.append(node)
        if len(clauses) == 1 and not must_nots:
            return clauses[0][1]
        if not (musts or shoulds or must_nots):
            return None
        return Bool(must=tuple(musts), should=tuple(shoulds), must_not=tuple(must_nots))

    def unary(self):
        sign = ""
        while True:
            t = self.peek()
            if t is None:
                return None
            if t.upper() == "NOT":
                self.next()
                sign = "-"
                continue
            if t and t[0] in "+-" and len(t) > 1:
                sign = t[0]
                self.toks[self.i] = t[1:]
            break
        node = self.primary()
        if node is None:
            return None
        return (sign, node)

    def primary(self):
        t = self.peek()
        if t is None or t == ")":
            if t == ")":
                self.next()
            return None
        self.next()
        if t == "(":
            node = self.or_expr()
            if self.peek() == ")":
                self.next()
            return node
        fld = self.default_field
        m = regex.match(r"^([a-zA-Z_][a-zA-Z0-9_]*):(.*)$", t)
        if m and m.group(2):
            fld, t = m.group(1), m.group(2)
            if t == "(":  # field:(...) group — leaves inherit the field
                saved = self.default_field
                self.default_field = fld
                node = self.or_expr()
                if self.peek() == ")":
                    self.next()
                self.default_field = saved
                return node
        return self._leaf(t, fld)


def parse_query_string(
    q: str, default_field: str = "text", default_operator: str = "or"
):
    """Parse the query_string grammar into a raydex Query tree."""
    from raydex.search.query import MatchAll

    toks = _lex(q)
    if not toks:
        return MatchAll()
    try:
        return _QSParser(toks, default_field, default_operator).parse()
    except Exception:
        # lenient fallback: bag of words
        from raydex.search.query import Match

        return Match(text=regex.sub(r"[^\w\s]", " ", q))
