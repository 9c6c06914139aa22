"""Arrow-native batch tokenization — the zero-Python-object hot path.

The per-doc Python tokenizer allocates one str per token (~10^8 objects
per partition at bench scale); measured on this box the allocation
traffic saturates memory bandwidth at ~2 cores, flat-lining build
scaling (BASELINE.md). This module runs the SAME standard-analyzer
semantics entirely in pyarrow C kernels for ASCII text:

  utf8_lower
  -> protect mid-token joiners with placeholder bytes, twice for chains
     ("a.b.c"): ([a-z0-9_])\\.([a-z0-9_]) -> \\1\\x01\\2, same for
     apostrophe, and ([0-9]),([0-9]) -> \\1\\x03\\2 (digit-comma rule)
  -> split_pattern_regex on the non-token class
  -> restore placeholders, drop empties, stop-filter via is_in
  -> dictionary_encode (C) for term codes; ONLY the unique term set
     (tens of thousands) ever becomes Python/numpy objects.

Non-ASCII rows and rows with >255-char tokens fall back to the exact
Python path (`standard_analyze_with_positions`) and are merged back —
property-tested identical to the Python analyzer on every row
(tests/test_arrow_tokenize.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydex.analysis.tokenizer import (
    ENGLISH_STOP_SET,
    MAX_TOKEN_LENGTH,
    standard_analyze_with_positions,
)

_P_DOT, _P_APOS, _P_COMMA = "\x01", "\x02", "\x03"
_SPLIT_CLASS = r"[^a-z0-9_\x01\x02\x03]+"
# \x01-\x03 are the joiner placeholder bytes — text that literally
# contains them must take the Python fallback or the restore step would
# corrupt it (they'd read back as '.', "'", ',' and wrongly join tokens)
_ASCII_RE = r"^[\x00\x04-\x7F]*$"


def _protect(arr: pa.Array) -> pa.Array:
    for _ in range(2):  # two passes resolve odd/even join chains
        arr = pc.replace_substring_regex(
            arr, pattern=r"([a-z0-9_])\.([a-z0-9_])", replacement="\\1\x01\\2"
        )
        arr = pc.replace_substring_regex(
            arr, pattern=r"([a-z0-9_])'([a-z0-9_])", replacement="\\1\x02\\2"
        )
        arr = pc.replace_substring_regex(
            arr, pattern=r"([0-9]),([0-9])", replacement="\\1\x03\\2"
        )
    return arr


def tokenize_batch(
    texts,
    stopwords: frozenset[str] | None = None,
    store_positions: bool = False,
):
    """Tokenize a batch of docs with standard-analyzer semantics.

    Returns ``(flat_tokens, doc_of, positions_or_None)`` where
    ``flat_tokens`` is a pyarrow StringArray of ALL kept tokens (doc-major
    order), ``doc_of`` the int64 doc index per token, ``positions`` the
    pre-stop-filter token position per kept token (only when requested).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array([t if t is not None else "" for t in texts], type=pa.large_string())
    texts = pc.fill_null(texts, "")
    n = len(texts)
    lower = pc.utf8_lower(texts)
    is_ascii = pc.match_substring_regex(lower, _ASCII_RE)
    ascii_idx = np.flatnonzero(np.asarray(is_ascii))
    other_idx = np.flatnonzero(~np.asarray(is_ascii))

    flat_parts, doc_parts, pos_parts = [], [], []

    if ascii_idx.size:
        sub = pc.take(lower, pa.array(ascii_idx))
        prot = _protect(sub)
        token_lists = pc.split_pattern_regex(prot, pattern=_SPLIT_CLASS)
        flat = pc.list_flatten(token_lists)
        parents = pc.list_parent_indices(token_lists)
        # restore joiners
        flat = pc.replace_substring(flat, pattern=_P_DOT, replacement=".")
        flat = pc.replace_substring(flat, pattern=_P_APOS, replacement="'")
        flat = pc.replace_substring(flat, pattern=_P_COMMA, replacement=",")
        keep = pc.not_equal(flat, "")
        # rows containing an overlong token take the python fallback
        lens = pc.utf8_length(flat)
        too_long = pc.greater(lens, MAX_TOKEN_LENGTH)
        if pc.any(too_long).as_py():
            bad_parents = np.unique(np.asarray(pc.filter(parents, too_long)))
            bad_rows = set(ascii_idx[bad_parents].tolist())
            row_ok = np.ones(ascii_idx.size, dtype=bool)
            row_ok[bad_parents] = False
            keep = pc.and_(
                keep,
                pa.array(row_ok[np.asarray(parents)]),
            )
            other_idx = np.concatenate(
                [other_idx, np.fromiter(bad_rows, dtype=np.int64)]
            )
        parents_np = np.asarray(parents, dtype=np.int64)
        # position within doc BEFORE stop filtering (empty tokens occupy
        # no position: drop empties FIRST, then number, then stop-filter)
        keep_np = np.asarray(keep)
        flat = pc.filter(flat, keep)
        parents_np = parents_np[keep_np]
        if store_positions:
            # ordinal within each doc (parents_np is doc-major sorted)
            starts = np.flatnonzero(
                np.diff(parents_np, prepend=parents_np[0] if parents_np.size else 0) != 0
            )
            pos = np.arange(parents_np.size, dtype=np.int64)
            doc_first = np.zeros(parents_np.size, dtype=np.int64)
            if parents_np.size:
                doc_first[starts] = pos[starts]
                np.maximum.accumulate(doc_first, out=doc_first)
                pos = pos - doc_first
        if stopwords:
            stop_arr = pa.array(sorted(stopwords))
            not_stop = pc.invert(pc.is_in(flat, value_set=stop_arr))
            ns_np = np.asarray(not_stop)
            flat = pc.filter(flat, not_stop)
            parents_keep = parents_np[ns_np]
            if store_positions:
                pos = pos[ns_np]
        else:
            parents_keep = parents_np
        flat_parts.append(flat)
        doc_parts.append(ascii_idx[parents_keep])
        if store_positions:
            pos_parts.append(pos)

    if other_idx.size:
        other_idx = np.unique(other_idx)
        toks_all, docs_all, pos_all = [], [], []
        raw = pc.take(texts, pa.array(other_idx))
        for row, text in zip(other_idx, raw.to_pylist()):
            toks, tpos = standard_analyze_with_positions(
                (text or "").lower(), stopwords
            )
            toks_all.extend(toks)
            docs_all.extend([row] * len(toks))
            pos_all.extend(tpos)
        flat_parts.append(pa.array(toks_all, type=pa.string()))
        doc_parts.append(np.asarray(docs_all, dtype=np.int64))
        if store_positions:
            pos_parts.append(np.asarray(pos_all, dtype=np.int64))

    if not flat_parts:
        empty = pa.array([], type=pa.string())
        return empty, np.empty(0, dtype=np.int64), (
            np.empty(0, dtype=np.int64) if store_positions else None
        )

    flat_tokens = pa.concat_arrays(
        [p.cast(pa.string()) if p.type != pa.string() else p for p in flat_parts]
    )
    doc_of = np.concatenate(doc_parts).astype(np.int64)
    positions = np.concatenate(pos_parts).astype(np.int64) if store_positions else None
    # re-establish doc-major order across the ascii/python partitions
    if len(flat_parts) > 1:
        order = np.argsort(doc_of, kind="stable")
        flat_tokens = pc.take(flat_tokens, pa.array(order))
        doc_of = doc_of[order]
        if store_positions:
            positions = positions[order]
    return flat_tokens, doc_of, positions


def encode_terms(flat_tokens: pa.Array):
    """dictionary_encode + lexicographic re-rank.

    Returns (codes int64 np [per occurrence, ranked by sorted term
    order], terms_sorted np object array).
    """
    if len(flat_tokens) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    d = pc.dictionary_encode(flat_tokens)
    codes = np.asarray(d.indices, dtype=np.int64)
    uniq = np.asarray(d.dictionary.to_pylist(), dtype=object)
    order = np.argsort(uniq, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    return rank[codes], uniq[order]
