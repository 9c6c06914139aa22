"""Suggesters — `term` suggester (edit-distance candidates from the term
dictionary, ``server/.../search/suggest/term/``) and a `phrase`-style
corrector that rescores whole inputs (``PhraseSuggester.java`` shape:
candidate generation + frequency ranking).
"""

from __future__ import annotations

from raydex.search.query import _edit_distance_le


def term_suggest(reader, text: str, max_edits: int = 2, size: int = 5,
                 analyzer=None, prefix_length: int = 1,
                 min_word_length: int = 4,
                 suggest_mode: str = "missing") -> dict:
    """Per input token: up to ``size`` dictionary terms within
    ``max_edits``, ranked by (edit distance asc, df desc, term asc).

    Candidate narrowing matches the reference's DirectSpellChecker
    defaults (``DirectSpellcheckerSettings.java:28-32``: prefix_length=1,
    min_word_length=4): the shared-prefix constraint is a binary-search
    RANGE over the sorted term dict and the +-max_edits length window is
    one vectorized mask (utf8_length cached per reader) — the exact
    banded edit-distance check runs only on the survivors, not the
    vocabulary.

    ``suggest_mode`` (``TermSuggestionBuilder.SuggestMode``):
    ``missing`` (default) suggests only for tokens absent from the
    dictionary; ``popular`` also suggests for present tokens but keeps
    only candidates with a HIGHER doc frequency than the input;
    ``always`` suggests regardless with no df gate."""
    import numpy as np
    import pyarrow.compute as pc

    toks = analyzer(text) if analyzer else text.lower().split()
    out: dict[str, list] = {}
    df = reader.df
    lens = getattr(reader, "_term_lens", None)
    if lens is None:
        lens = reader._term_lens = pc.utf8_length(
            reader._terms_pa).to_numpy(zero_copy_only=False)
    for tok in toks:
        tid = reader.lookup(tok)
        tok_df = int(df[tid]) if tid >= 0 else 0
        if ((suggest_mode == "missing" and tid >= 0)
                or len(tok) < min_word_length):
            out[tok] = []  # exact hit (missing mode) / too short
            continue
        from raydex.search.query import expand_prefix

        if prefix_length > 0:
            idx = np.asarray(expand_prefix(reader, tok[:prefix_length]),
                             dtype=np.int64)
        else:
            idx = np.arange(lens.size, dtype=np.int64)
        if idx.size:
            w = lens[idx]
            idx = idx[(w >= len(tok) - max_edits)
                      & (w <= len(tok) + max_edits)]
        cands = []
        for i in idx:
            if suggest_mode == "popular" and int(df[i]) <= tok_df:
                continue
            t = str(reader._terms_pa[int(i)].as_py())
            if t == tok:
                continue
            for d in range(1, max_edits + 1):
                if _edit_distance_le(tok, t, d):
                    cands.append((d, -int(df[i]), t))
                    break
        cands.sort()
        out[tok] = [
            {"text": t, "distance": d, "freq": -negdf}
            for d, negdf, t in cands[:size]
        ]
    return out


def merge_term_suggestions(per_seg: list[dict], size: int = 5) -> dict:
    """Coordinator reduce for scatter-gathered term suggestions
    (``TermSuggestion#reduce``): per-text doc frequencies SUM across
    shards, distance is shard-invariant (min kept defensively), and
    the merged list re-ranks by (distance asc, freq desc, text asc)."""
    out: dict[str, list] = {}
    toks: set = set()
    for p in per_seg:
        toks.update(p)
    for tok in toks:
        agg: dict[str, dict] = {}
        for p in per_seg:
            for o in p.get(tok, []):
                e = agg.setdefault(o["text"],
                                   {"distance": o["distance"], "freq": 0})
                e["freq"] += o["freq"]
                e["distance"] = min(e["distance"], o["distance"])
        ranked = sorted(agg.items(),
                        key=lambda kv: (kv[1]["distance"],
                                        -kv[1]["freq"], kv[0]))
        out[tok] = [{"text": t, **v} for t, v in ranked[:size]]
    return out


def phrase_suggest(reader, text: str, max_edits: int = 1, size: int = 3,
                   analyzer=None) -> list[dict]:
    """Whole-input correction: per-token best replacements, combined and
    ranked by sum of corrected-term frequencies (freq-weighted candidate
    ranking, the PhraseSuggester shape without the language model)."""
    toks = analyzer(text) if analyzer else text.lower().split()
    per_tok = []
    for tok in toks:
        if reader.lookup(tok) >= 0:
            per_tok.append([(tok, 0, int(reader.df[reader.lookup(tok)]))])
            continue
        sugg = term_suggest(reader, tok, max_edits=max_edits, size=size)
        cands = [(s["text"], s["distance"], s["freq"]) for s in sugg.get(tok, [])]
        per_tok.append(cands or [(tok, 0, 0)])
    # greedy best per slot (full cartesian explodes; reference also prunes)
    options = []
    for choice_idx in range(size):
        parts, score = [], 0
        for cands in per_tok:
            t, d, f = cands[min(choice_idx, len(cands) - 1)]
            parts.append(t)
            score += f
        options.append({"text": " ".join(parts), "score": score})
    seen, out = set(), []
    for o in sorted(options, key=lambda x: -x["score"]):
        if o["text"] not in seen:
            seen.add(o["text"])
            out.append(o)
    return out[:size]


def completion_suggest(reader, prefix: str, size: int = 5) -> list[dict]:
    """`completion` suggester analogue (``search/suggest/completion/``):
    prefix-ranked completions from the term dictionary, weight = df
    (the FST-with-weights shape re-expressed over the sorted term dict
    — same contract: top-N completions for a prefix by weight)."""
    from raydex.search.query import expand_prefix

    idx = expand_prefix(reader, prefix.lower())
    cands = sorted(
        ((int(reader.df[i]), str(reader.terms[i])) for i in idx),
        key=lambda x: (-x[0], x[1]),
    )
    return [{"text": t, "weight": w} for w, t in cands[:size]]


def phrase_suggest_lm(reader, text: str, max_edits: int = 1,
                      num_candidates: int = 5, size: int = 3,
                      backoff: float = 0.4, analyzer=None,
                      collate: bool = False) -> list[dict]:
    """`phrase` suggester with the reference's real shape
    (``PhraseSuggester.java``: per-term candidate generation + a
    word-LM rescore; the default smoothing is StupidBackoff(0.4)):

        score(w1..wn) = prod_i P(w_i | w_{i-1})
        P(w|v) = bigram(v,w)/unigram(v)  if bigram seen
               = backoff * unigram(w)/N  otherwise

    Bigram frequencies come from the POSITIONAL index
    (phrase_frequencies of the pair) — the same statistics the
    reference reads from a shingled field. Beam search over per-slot
    candidates keeps it linear in input length."""
    from raydex.search.phrase import phrase_frequencies

    toks = analyzer(text) if analyzer else text.lower().split()
    if not toks:
        return []
    total_cf = max(int(reader.cf.sum()), 1)

    def unigram(t: str) -> int:
        ti = reader.lookup(t)
        return int(reader.cf[ti]) if ti >= 0 else 0

    def bigram(a: str, b: str) -> int:
        try:
            docs, pf = phrase_frequencies(reader, [a, b], [0, 1])
        except ValueError:  # no positions stored
            return 0
        return int(pf.sum()) if docs.size else 0

    def candidates(tok: str) -> list[str]:
        out = [tok] if reader.lookup(tok) >= 0 else []
        sugg = term_suggest(reader, tok, max_edits=max_edits, size=num_candidates)
        out += [s["text"] for s in sugg.get(tok, [])]
        return out or [tok]

    import math

    beams = [([], 0.0)]  # (words, log score)
    for i, tok in enumerate(toks):
        nxt = []
        for words, lp in beams:
            for cand in candidates(tok):
                u = unigram(cand)
                if i == 0 or not words:
                    p = max(u, 0.5) / total_cf
                else:
                    bg = bigram(words[-1], cand)
                    prev_u = unigram(words[-1])
                    if bg > 0 and prev_u > 0:
                        p = bg / prev_u
                    else:
                        p = backoff * max(u, 0.5) / total_cf
                nxt.append((words + [cand], lp + math.log(p)))
        nxt.sort(key=lambda x: (-x[1], x[0]))
        beams = nxt[: max(size, num_candidates)]
    def collate_hit(words: list[str]) -> bool:
        """`collate` (PhraseSuggester collate query): keep only
        corrections that actually MATCH — here the default collate
        query, a conjunction of the suggestion's terms (>=1 doc
        contains them all), evaluated by posting-list intersection."""
        import numpy as np

        docs = None
        for w in words:
            ti = reader.lookup(w)
            if ti < 0:
                return False
            d, _ = reader.postings(ti)
            docs = d if docs is None else np.intersect1d(
                docs, d, assume_unique=True)
            if docs.size == 0:
                return False
        return True

    seen, out = set(), []
    for words, lp in beams:
        s = " ".join(words)
        if s in seen:
            continue
        seen.add(s)
        if collate and not collate_hit(words):
            continue
        out.append({"text": s, "score": float(math.exp(lp / max(len(words), 1)))})
        if len(out) >= size:
            break
    return out


def _auto_fuzziness(s: str) -> int:
    """The reference's ``Fuzziness.AUTO`` ladder: 0 edits below 3
    chars, 1 up to 5, 2 beyond (``Fuzziness.java``)."""
    n = len(s)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def _prefix_within_edits(q: str, inp: str, k: int,
                         transpositions: bool = True) -> bool:
    """FuzzyCompletionQuery acceptance: some PREFIX of ``inp`` is
    within ``k`` edits of the query prefix ``q`` (the Levenshtein
    automaton ∩ FST walk). One banded DP over ``inp[:len(q)+k]``;
    ``transpositions`` enables the restricted Damerau swap."""
    if k == 0:
        return inp.startswith(q)
    m = len(q)
    t = inp[: m + k]
    prev = list(range(m + 1))
    prev2: list[int] | None = None
    best = prev[m]
    for j, cj in enumerate(t, start=1):
        cur = [j] + [0] * m
        for i in range(1, m + 1):
            cost = 0 if q[i - 1] == cj else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if (transpositions and i > 1 and j > 1 and prev2 is not None
                    and q[i - 1] == t[j - 2] and q[i - 2] == cj):
                cur[i] = min(cur[i], prev2[i - 2] + 1)
        best = min(best, cur[m])
        prev2, prev = prev, cur
    return best <= k


def _context_boost(entry_ctx: list[str],
                   want: dict[str, list[tuple[bool, str, float]]]):
    """Match an entry's ``name\\x00value`` tokens against the parsed
    query clauses (is_prefix, value, boost); returns the boost
    multiplier or None if filtered out. Per the reference
    (ContextMappings): every queried context NAME must match; boost is
    the product over context names of the best matching clause's
    boost. Prefix clauses (geo cells) match any token whose value
    starts with the cell string."""
    total = 1.0
    have = set(entry_ctx)
    for name, clauses in want.items():
        best = None
        for is_prefix, val, boost in clauses:
            tok = f"{name}\x00{val}"
            hit = (any(t.startswith(tok) for t in have)
                   if is_prefix else tok in have)
            if hit:
                best = boost if best is None else max(best, boost)
        if best is None:
            return None
        total *= best
    return total


def _parse_contexts(contexts: dict | None) \
        -> dict[str, list[tuple[bool, str, float]]]:
    """ES query form -> {name: [(is_prefix, value, boost)]}. A clause
    is a bare value string, ``{"context": v, "boost": b}``, or a GEO
    clause ``{"context": {"lat": .., "lon": ..}, "precision": p,
    "boost": b, "neighbours": true}`` (``GeoQueryContext``): the point
    maps to its geohash cell at ``precision`` (default 6, the indexed
    precision cap) plus the 8 surrounding cells, matched by cell
    prefix so coarser query precisions widen the net."""
    out: dict[str, list[tuple[bool, str, float]]] = {}
    for name, clauses in (contexts or {}).items():
        cl: list[tuple[bool, str, float]] = []
        for c in (clauses if isinstance(clauses, (list, tuple)) else [clauses]):
            if not isinstance(c, dict):
                cl.append((False, str(c), 1.0))
                continue
            v = c["context"]
            boost = float(c.get("boost", 1.0))
            if isinstance(v, dict) and "lat" in v and "lon" in v:
                from raydex.ops.geo import geohash_encode, geohash_neighbors

                prec = min(6, int(c.get("precision", 6)))
                cell = geohash_encode([float(v["lat"])],
                                      [float(v["lon"])],
                                      precision=prec)[0]
                cells = [cell]
                if c.get("neighbours", True):
                    cells += geohash_neighbors(cell)
                cl += [(True, g, boost) for g in cells]
            else:
                cl.append((False, str(v), boost))
        out[name] = cl
    return out


def completion_field_suggest(reader, field: str, prefix: str, size: int = 5,
                             skip_duplicates: bool = False,
                             contexts: dict | None = None,
                             fuzzy: dict | bool | None = None) -> list[dict]:
    """`completion` suggester over a DEDICATED index-time completion
    field (``CompletionFieldMapper.java`` + ``suggest/completion/``):
    one binary-search range over the input-sorted table (the weighted-FST
    prefix walk analogue), top-``size`` by (score desc, input asc,
    docid asc) where score = weight × context boost.
    ``skip_duplicates`` keeps the best-weighted option per distinct
    input (TopSuggestDocsCollector's dedup mode).

    ``contexts`` filters and boosts by category contexts
    (``CategoryQueryContext``: {"name": ["v", {"context": v, "boost": b}]}).
    ``fuzzy`` enables FuzzyCompletionQuery semantics — options whose
    input prefix is within ``fuzziness`` edits (AUTO ladder by default,
    exact-first tie order like the reference's exact-match preference):
    {"fuzziness": "AUTO"|0|1|2, "prefix_length": 1, "min_length": 3,
    "transpositions": true}."""
    import numpy as np

    inputs, weights, docids, ctxs = reader.completion_field(field)
    want = _parse_contexts(contexts)
    fz = ({} if fuzzy is True else dict(fuzzy)) if fuzzy else None
    if fz is not None and len(prefix) < int(fz.get("min_length", 3)):
        fz = None  # below min_length fuzzy degrades to exact (reference)
    if fz is None:
        lo = int(np.searchsorted(inputs, prefix, side="left"))
        hi = int(np.searchsorted(inputs, prefix + "\U0010FFFF",
                                 side="left"))
        span = [(i, True) for i in range(lo, hi)
                if str(inputs[i]).startswith(prefix)]
    else:
        fuzz = fz.get("fuzziness", "AUTO")
        k = (_auto_fuzziness(prefix) if str(fuzz).upper() == "AUTO"
             else int(fuzz))
        plen = int(fz.get("prefix_length", 1))
        tr = bool(fz.get("transpositions", True))
        anchor = prefix[:plen]
        lo = int(np.searchsorted(inputs, anchor, side="left"))
        hi = int(np.searchsorted(inputs, anchor + "\U0010FFFF",
                                 side="left")) if anchor else len(inputs)
        span = []
        for i in range(lo, hi):
            s = str(inputs[i])
            if s.startswith(prefix):
                span.append((i, True))
            elif _prefix_within_edits(prefix, s, k, transpositions=tr):
                span.append((i, False))
    cand = []
    for i, exact in span:
        boost = _context_boost(ctxs[i] or [], want)
        if boost is None:
            continue
        cand.append((0 if exact else 1, -float(weights[i]) * boost,
                     str(inputs[i]), int(docids[i])))
    cand.sort()
    out, seen = [], set()
    for fuzz_rank, negscore, text, d in cand:
        if skip_duplicates:
            if text in seen:
                continue
            seen.add(text)
        out.append({"text": text, "weight": int(-negscore) if
                    float(-negscore).is_integer() else -negscore,
                    "score": -negscore, "exact": not fuzz_rank,
                    "url": reader.url_of(d)})
        if len(out) >= size:
            break
    return out


def merge_completion_options(per_segment: list[list[dict]], size: int = 5,
                             skip_duplicates: bool = False) -> list[dict]:
    """Coordinator-side reduce for scatter-gathered completion options
    (same contract as TopDocs.merge: exact-before-fuzzy, score desc,
    text asc)."""
    allc = sorted(
        (o for seg in per_segment for o in seg),
        key=lambda o: (0 if o.get("exact", True) else 1,
                       -float(o.get("score", o["weight"])),
                       o["text"], o["url"]),
    )
    out, seen = [], set()
    for o in allc:
        if skip_duplicates:
            if o["text"] in seen:
                continue
            seen.add(o["text"])
        out.append(o)
        if len(out) >= size:
            break
    return out
