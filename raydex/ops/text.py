"""Text-analysis operators for training-data pipelines.

- language-ID (stopword/character n-gram heuristic)
- quality scoring (length / punctuation / stopword ratios)
- token counting (whitespace + BPE-ish regex subword count)
- document fingerprinting (rolling Rabin-Karp hash windows)

All vectorized-per-batch (``map_batches``), deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import regex

from raydex.analysis.tokenizer import ENGLISH_STOP_SET

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "para", "por"},
}
_BPE_RE = regex.compile(r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]")
_PUNCT_RE = regex.compile(r"[\p{P}\p{S}]")
_CJK_RE = regex.compile(r"[\p{Han}\p{Hiragana}\p{Katakana}]")


def detect_lang(text: str) -> str:
    """n-gram/stopword heuristic language id (no external model)."""
    if _CJK_RE.search(text):
        return "zh" if regex.search(r"\p{Han}", text) and not regex.search(
            r"[\p{Hiragana}\p{Katakana}]", text
        ) else "ja"
    toks = set(text.lower().split())
    best, best_n = "unknown", 0
    for lang, markers in _LANG_MARKERS.items():
        n = len(toks & markers)
        if n > best_n:
            best, best_n = lang, n
    return best


_LANG_ORDER = list(_LANG_MARKERS)  # tie-break: earlier language wins
_CJK_RE2 = r"[\p{Han}\p{Hiragana}\p{Katakana}]"
_HAN_RE2 = r"\p{Han}"
_KANA_RE2 = r"[\p{Hiragana}\p{Katakana}]"


def _tokens_flat(txt: pa.ChunkedArray | pa.Array):
    """(flat nonempty tokens, doc_of, per-doc counts) for a batch —
    matches ``str.split()`` semantics (whitespace runs, empties dropped)."""
    import pyarrow.compute as pc

    tl = pc.utf8_split_whitespace(txt)
    if isinstance(tl, pa.ChunkedArray):
        tl = tl.combine_chunks()
    flat = pc.list_flatten(tl)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.list_value_length(tl).to_numpy(zero_copy_only=False)
    doc_of = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        doc_of = doc_of[nonempty]
    counts = np.bincount(doc_of, minlength=lens.size)
    return flat, doc_of, counts


def lang_id(ds, text_col: str, out_col: str = "lang_pred"):
    """Vectorized detect_lang: per-language DISTINCT-marker counts via
    one ``index_in`` over the batch's flat token array + a per-doc
    bitmask OR (``np.bitwise_or.reduceat``); CJK routing via RE2 class
    matches. Identical outputs to the scalar ``detect_lang`` (the r2
    per-row loop this replaces) — same first-max tie-break, same
    marker sets, SQL oracle unchanged."""
    import pyarrow.compute as pc

    marker_list = [m for lang in _LANG_ORDER for m in sorted(_LANG_MARKERS[lang])]
    marker_bits = np.array(
        [1 << i for i in range(len(marker_list))], dtype=np.int64
    )
    lang_of_marker = np.repeat(
        np.arange(len(_LANG_ORDER)),
        [len(_LANG_MARKERS[lang]) for lang in _LANG_ORDER],
    )
    marker_set = pa.array(marker_list, pa.string())

    def add(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        n = t.num_rows
        flat, doc_of, counts = _tokens_flat(pc.utf8_lower(txt))
        idx_pa = pc.index_in(flat, value_set=marker_set)
        hitm = pc.is_valid(idx_pa).to_numpy(zero_copy_only=False)
        idx_i = pc.fill_null(idx_pa, 0).to_numpy(zero_copy_only=False).astype(np.int64)
        bits = np.where(hitm, marker_bits[idx_i], 0)
        masks = np.zeros(n, dtype=np.int64)
        if doc_of.size:
            starts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
            masks[doc_of[starts]] = np.bitwise_or.reduceat(bits, starts)
        # distinct marker count per (doc, lang) from the bitmask
        lang_counts = np.zeros((n, len(_LANG_ORDER)), dtype=np.int64)
        for mi in range(len(marker_list)):
            has = (masks >> mi) & 1
            lang_counts[:, lang_of_marker[mi]] += has
        best = np.argmax(lang_counts, axis=1)  # first max == scalar tie rule
        best_n = lang_counts[np.arange(n), best]
        langs = np.array(_LANG_ORDER, dtype=object)
        pred = np.where(best_n > 0, langs[best], "unknown").astype(object)
        cjk = pc.match_substring_regex(txt, _CJK_RE2).to_numpy(zero_copy_only=False)
        if cjk.any():
            han = pc.match_substring_regex(txt, _HAN_RE2).to_numpy(zero_copy_only=False)
            kana = pc.match_substring_regex(txt, _KANA_RE2).to_numpy(zero_copy_only=False)
            pred[cjk] = np.where(han[cjk] & ~kana[cjk], "zh", "ja")
        return t.append_column(out_col, pa.array(pred, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def quality_features(ds, text_col: str, id_col: str):
    """Per-doc quality components (ints/exact floats for SQL checking):
    char_len, word_count (single-space split), punct_count, stop_count,
    upper_count, plus float ratios."""

    stop_arr = pa.array(sorted(ENGLISH_STOP_SET))

    def feats(t: pa.Table) -> pa.Table:
        # all-Arrow kernels (RE2 counts + one split), no Python rows —
        # the r3 vectorization of the r2 per-row loops; byte-identical
        # outputs (upper_count contract: \p{Lu}, == str.isupper on every
        # cased letter)
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        words = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        isstop = pc.is_in(pc.utf8_lower(flat), value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        stop = np.bincount(parents[isstop], minlength=len(t)).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "char_len": pc.utf8_length(txt).cast(pa.int64()),
                "word_count": pc.list_value_length(words).cast(pa.int64()),
                "punct_count": pc.count_substring_regex(
                    txt, r"[\p{P}\p{S}]"
                ).cast(pa.int64()),
                "stop_count": pa.array(stop, pa.int64()),
                "upper_count": pc.count_substring_regex(txt, r"\p{Lu}").cast(
                    pa.int64()
                ),
            }
        )

    return ds.map_batches(feats, batch_format="pyarrow")


def quality_score(ds, text_col: str, id_col: str):
    """Composite quality score in [0,1]: penalize very short docs, high
    punctuation density, and zero stopwords (gibberish heuristic)."""

    stop_arr = pa.array(sorted(ENGLISH_STOP_SET))

    def score(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        n = len(t)
        wc = np.maximum(
            pc.count_substring_regex(txt, r"\S+").to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        char_len = np.maximum(
            pc.utf8_length(txt).to_numpy(zero_copy_only=False), 1
        ).astype(np.float64)
        punct = pc.count_substring_regex(txt, r"[\p{P}\p{S}]").to_numpy(
            zero_copy_only=False
        )
        words = pc.utf8_split_whitespace(txt)
        flat = pc.list_flatten(words)
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        isstop = pc.is_in(pc.utf8_lower(flat), value_set=stop_arr).to_numpy(
            zero_copy_only=False
        )
        stopc = np.bincount(parents[isstop], minlength=n).astype(np.float64)
        # float-op order mirrors the scalar version exactly
        len_score = np.minimum(1.0, (wc / 50.0))
        stop_part = np.minimum(1.0, 4 * (stopc / wc))
        punct_part = 1.0 - np.minimum(1.0, 5 * (punct / char_len))
        q = np.round(0.4 * len_score + 0.3 * stop_part + 0.3 * punct_part, 6)
        return pa.table({id_col: t[id_col], "quality": pa.array(q, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def token_counts(ds, text_col: str, id_col: str):
    """whitespace_tokens (split on single space) + bpe-ish subword count."""

    def cnt(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        return pa.table(
            {
                id_col: t[id_col],
                "ws_tokens": pc.list_value_length(
                    pc.split_pattern(txt, " ")
                ).cast(pa.int64()),
                "bpe_tokens": pc.count_substring_regex(
                    txt, r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"
                ).cast(pa.int64()),
            }
        )

    return ds.map_batches(cnt, batch_format="pyarrow")


def top_terms(ds, text_col: str, size: int = 20):
    """Global most-frequent whitespace tokens: per-batch partial counts
    (map-side combine) -> groupby(token).sum -> top-N. The merge-shuffle
    pattern at word granularity."""

    def partial(t: pa.Table) -> pa.Table:
        # one Arrow split + value_counts per batch — no Python token
        # objects (replaces the r2 Counter loop; identical counts)
        import pyarrow.compute as pc

        toks = pc.list_flatten(
            pc.split_pattern(pc.fill_null(t[text_col].cast(pa.string()), ""), " ")
        )
        vc = pc.value_counts(toks)
        return pa.table(
            {
                "token": vc.field("values").cast(pa.string()),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("token").sum("cnt")
    out = out.map_batches(
        lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow"
    )
    return out.sort(["cnt", "token"], descending=[True, False]).limit(size)


def rolling_fingerprints(text: str, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> list[int]:
    """Rabin-Karp rolling hashes of token windows (document fingerprint;
    winnowing-style selection = min per stride). True O(1) roll per
    window (subtract the leading term, shift, add the new one) over
    memoized token hashes — values identical to ``hash_tokens`` per
    window (tested), replacing the r2 O(window) recompute per step."""
    toks = text.split()
    if len(toks) < window:
        toks = toks + [""] * (window - len(toks))
    ths = [_token_hash(t, base, mod) + 1 for t in toks]
    lead = pow(base, window - 1, mod)
    h = 0
    for th in ths[:window]:
        h = (h * base + th) % mod
    hs = [h]
    for i in range(window, len(ths)):
        h = ((h - ths[i - window] * lead) * base + ths[i]) % mod
        hs.append(h)
    return hs


_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_CAP = 1 << 20


def _token_hash(t: str, base: int, mod: int) -> int:
    """Per-token polynomial hash, memoized per worker — tokens repeat
    heavily, and the byte loop dominated doc_fingerprint's wall time
    (r2 'per-row Python' item; values unchanged)."""
    key = (t, base, mod)
    th = _TOKEN_HASH_CACHE.get(key)
    if th is None:
        th = 0
        for ch in t.encode():
            th = (th * base + ch) % mod
        if len(_TOKEN_HASH_CACHE) < _TOKEN_HASH_CACHE_CAP:
            _TOKEN_HASH_CACHE[key] = th
    return th


def hash_tokens(toks: list[str], base: int, mod: int) -> int:
    h = 0
    for t in toks:
        h = (h * base + _token_hash(t, base, mod) + 1) % mod
    return h


# --- vectorized Mersenne-61 modular arithmetic (uint64 limb split) ---
# The fingerprint modulus is the Mersenne prime p = 2^61 - 1.  Products
# of two <2^61 residues need 122 bits, so a*b is evaluated in 30/31-bit
# limbs with the 2^61 ≡ 1 folding rule; every intermediate fits uint64.

_P61 = np.uint64((1 << 61) - 1)
_M31 = np.uint64((1 << 31) - 1)
_M30 = np.uint64((1 << 30) - 1)


def _mulmod61(a, b):
    """(a * b) mod (2^61 - 1), elementwise on uint64 arrays, a,b < 2^61."""
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    a1, a0 = a >> np.uint64(31), a & _M31
    b1, b0 = b >> np.uint64(31), b & _M31
    mid = a1 * b0 + a0 * b1                      # < 2^62
    mh, ml = mid >> np.uint64(30), mid & _M30    # mid = mh*2^30 + ml
    # a*b = a1*b1*2^62 + mid*2^31 + a0*b0; 2^62 ≡ 2, mh*2^61 ≡ mh (mod p)
    x = (a1 * b1 << np.uint64(1)) + mh + (ml << np.uint64(31)) + a0 * b0
    x = (x >> np.uint64(61)) + (x & _P61)
    x = (x >> np.uint64(61)) + (x & _P61)
    return np.where(x >= _P61, x - _P61, x)


def _mulmod61_small(a, b: int):
    """(a * b) mod (2^61-1) for a < 2^61 and a SCALAR b < 2^31 — the
    Horner hot path (b = base): half the limb work of the general case."""
    b = np.uint64(b)
    a1, a0 = a >> np.uint64(31), a & _M31
    c = a1 * b                                   # < 2^61
    ch, cl = c >> np.uint64(30), c & _M30        # c*2^31 ≡ ch + cl*2^31
    x = ch + (cl << np.uint64(31)) + a0 * b      # < 2^63
    x = (x >> np.uint64(61)) + (x & _P61)
    x = (x >> np.uint64(61)) + (x & _P61)
    return np.where(x >= _P61, x - _P61, x)


def _addmod61(a, b):
    s = np.asarray(a, np.uint64) + np.asarray(b, np.uint64)
    s = (s >> np.uint64(61)) + (s & _P61)
    return np.where(s >= _P61, s - _P61, s)


def _submod61(a, b):
    return _addmod61(a, _P61 - np.asarray(b, np.uint64))


def doc_fingerprint(ds, text_col: str, id_col: str, window: int = 8, keep: int = 4):
    """Winnowed fingerprint: the ``keep`` smallest rolling hashes per doc
    (deterministic near-dup signal). Values are bit-identical to the
    scalar ``rolling_fingerprints`` reference (property-tested).

    Vectorized: the batch's token hashes are flattened into one uint64
    array and the window hash h_i = Σ_j th[i+j]·base^{w-1-j} mod p is
    evaluated by Horner over ``window`` shifted slices — w mulmod+addmod
    passes, no per-window Python (windows that straddle doc boundaries
    are dropped by index arithmetic; short docs are padded like the
    scalar path). Winnowing select is one per-doc lexsort. Per-token
    hashes stay memoized Python (the token vocabulary is tiny next to
    the window count)."""
    base, mod = 257, (1 << 61) - 1

    def fp(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        if not texts:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "fingerprint": pa.array([], pa.list_(pa.int64()))})
        flat_toks: list[str] = []
        lens = np.empty(len(texts), np.int64)
        for k, s in enumerate(texts):
            toks = str(s).split()
            if len(toks) < window:
                toks = toks + [""] * (window - len(toks))
            lens[k] = len(toks)
            flat_toks.extend(toks)
        # hash UNIQUE tokens only (dictionary encode), then gather:
        # the vocabulary is tiny next to the token count.
        denc = pa.array(flat_toks, pa.string()).dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        uh = np.fromiter((_token_hash(u, base, mod) + 1 for u in uniq),
                         np.uint64, len(uniq))
        ths = uh[denc.indices.to_numpy(zero_copy_only=False)]
        n = len(ths)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        # Horner: rolling hash at EVERY flat position, then keep the
        # within-doc ones (cross-boundary windows are never selected).
        nall = n - window + 1
        h_all = ths[:nall].copy()
        for j in range(1, window):
            h_all = _addmod61(_mulmod61_small(h_all, base),
                              ths[j:j + nall])
        counts = lens - window + 1
        wstarts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        i = np.arange(int(counts.sum())) - np.repeat(wstarts, counts) \
            + np.repeat(starts, counts)
        h = h_all[i]
        # winnowing select: keep smallest `keep` per doc, ascending —
        # per-doc np.partition on ~window-count-sized slices beats a
        # global lexsort by >10x (the slices are tiny and contiguous)
        kept_counts = np.minimum(counts, keep)
        kept = np.empty(int(kept_counts.sum()), np.int64)
        pos = 0
        for d in range(len(texts)):
            seg = h[wstarts[d]:wstarts[d] + counts[d]]
            if counts[d] > keep:
                sel = np.partition(seg, keep - 1)[:keep]
                sel.sort()
            else:
                sel = np.sort(seg)
            kept[pos:pos + len(sel)] = sel.astype(np.int64)
            pos += len(sel)
        offs = np.concatenate(([0], np.cumsum(kept_counts)))
        fp_arr = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(kept, pa.int64()))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "fingerprint": fp_arr})

    return ds.map_batches(fp, batch_format="pyarrow")


def decontaminate(
    ds,
    text_col: str,
    id_col: str,
    benchmark_ngrams: set[str],
    n: int = 8,
    threshold: float = 0.5,
):
    """Benchmark decontamination (the training-data hygiene op): flag
    documents whose token ``n``-gram overlap with a benchmark/eval set
    exceeds ``threshold``.

    The benchmark n-gram set is the broadcast small side (``ray.put``
    once, read per task — never re-shipped per batch); each batch is a
    vectorized membership test over its shingles. Emits
    (id, ngram_total, ngram_hits, contamination, contaminated) per doc;
    callers filter/route on ``contaminated``. At 100 TB the documents
    stream; only the benchmark set is resident per worker.

    Shape mirrors the reference's terms-lookup broadcast pattern
    (es/index/query/TermsQueryBuilder.java fetch path) applied to the
    open-data decontamination recipe (n-gram collision vs eval sets).
    """
    import pyarrow.compute as pc
    import ray

    ref = ray.put(pa.array(sorted(benchmark_ngrams), pa.string()))

    def flag(t: pa.Table) -> pa.Table:
        # vectorized windows: one whitespace split, k shifted views of
        # the flat token array joined element-wise, ONE is_in membership
        # pass against the broadcast set (replaces the r2 per-doc gram
        # loop; identical totals/hits)
        bench = ray.get(ref)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        nrows = t.num_rows
        txt = pc.fill_null(t[text_col].cast(pa.string()), "")
        flat, doc_of, counts = _tokens_flat(txt)
        offs = np.zeros(nrows + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        m = len(flat)
        totals = np.zeros(nrows, dtype=np.int64)
        hits = np.zeros(nrows, dtype=np.int64)
        if m >= n:
            starts = np.arange(m - n + 1)
            w_doc = np.searchsorted(offs, starts, side="right") - 1
            valid = starts + n <= offs[w_doc + 1]
            shifted = [flat.slice(j, m - n + 1) for j in range(n)]
            windows = pc.binary_join_element_wise(*shifted, " ")
            hit = pc.is_in(windows, value_set=bench).to_numpy(zero_copy_only=False)
            vd = w_doc[valid]
            totals += np.bincount(vd, minlength=nrows)
            hits += np.bincount(vd[hit[valid]], minlength=nrows)
        # docs with 0 < len < n emit ONE gram: the whole joined text
        short = np.flatnonzero((counts > 0) & (counts < n))
        if short.size:
            grams = [
                " ".join(flat.slice(int(offs[d]), int(counts[d])).to_pylist())
                for d in short
            ]
            sh = pc.is_in(pa.array(grams, pa.string()), value_set=bench)
            totals[short] = 1
            hits[short] = sh.to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = hits / np.maximum(totals, 1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "ngram_total": pa.array(totals),
                "ngram_hits": pa.array(hits),
                "contamination": pa.array(ratio, pa.float64()),
                "contaminated": pa.array(ratio >= threshold),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def benchmark_ngram_set(texts, n: int = 8) -> set[str]:
    """Build the benchmark-side n-gram set (driver-side small input)."""
    out: set[str] = set()
    for s in texts:
        toks = str(s).split()
        if len(toks) < n:
            if toks:
                out.add(" ".join(toks))
        else:
            out.update(" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1))
    return out


# PII scrubbing (training-data hygiene). Patterns are RE2-compatible so
# the DuckDB oracle can run the IDENTICAL regexes; applied in a fixed
# order (email -> ipv4 -> ssn -> phone) because the later patterns can
# overlap digit runs the earlier ones already consumed.
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phones", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_redact(ds, text_col: str, id_col: str):
    """Redact emails / IPv4s / SSNs / phone numbers from ``text_col``,
    emitting (id, redacted, n_emails, n_ipv4, n_ssn, n_phones).

    Arrow-native zero-copy stage: ``pc.count_substring_regex`` /
    ``pc.replace_substring_regex`` run Arrow's RE2 kernels directly on
    the string column — no pandas round-trip. Streams: no shuffle, no
    driver collect; at 100 TB this is a pure map stage.

    Reference analogue: the gsub/remove ingest processors
    (modules/ingest-common/.../GsubProcessor.java) specialized to the
    open-data PII-scrub recipe.
    """
    def scrub(t: pa.Table) -> pa.Table:
        s = pc.cast(t[text_col], pa.large_string())
        cols = {id_col: t[id_col]}
        counts = {}
        for name, pat, repl in _PII_PATTERNS:
            counts["n_" + name] = pc.cast(
                pc.count_substring_regex(s, pat), pa.int64())
            s = pc.replace_substring_regex(s, pat, repl)
        cols["redacted"] = s
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def stratified_sample(
    ds,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: int = 0,
):
    """Deterministic per-stratum downsampling — the source-mixing /
    rebalancing step of a training-data pipeline (keep p_s of stratum s).

    Keep decision is a pure function of the row id (Knuth multiplicative
    hash over the low 32 bits, optionally salted), NOT an RNG: reruns,
    resumes and the SQL oracle all reproduce the identical sample. A
    pure map-side filter — no shuffle, no driver state; the rate table
    is a tiny closure dict (broadcast once with the function).

    SQL-oracle contract (documented so the oracle stays in lockstep):
    keep iff ((id % 2^32 + salt) * 2654435761) % 2^32 % 1000000 <
    rate * 1e6.
    """
    import pyarrow.compute as pc

    thresh = {
        s: np.int64(min(max(r, 0.0), 1.0) * 1_000_000) for s, r in rates.items()
    }
    dflt = np.int64(min(max(default_rate, 0.0), 1.0) * 1_000_000)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids % 2**32 + np.uint64(salt)) * np.uint64(2654435761)) % 2**32
        bucket = (h % np.uint64(1_000_000)).astype(np.int64)
        strata = t[strata_col].to_pylist()
        lim = np.fromiter(
            (thresh.get(s, dflt) for s in strata), dtype=np.int64, count=len(strata)
        )
        return t.filter(pa.array(bucket < lim))

    return ds.map_batches(keep, batch_format="pyarrow")


def repetition_stats(ds, text_col: str, id_col: str, n: int = 2):
    """Repetition-ratio quality signal (the duplicate-n-gram rule of
    published web-corpus filters): per doc, the fraction of token
    ``n``-grams that are repeats of an earlier one. High values mark
    boilerplate / spam for downstream filtering. Pure map stage —
    streams at any scale; exact-SQL-checkable (distinct vs total
    n-gram counts)."""

    def stats(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        total = np.zeros(len(ids), dtype=np.int64)
        distinct = np.zeros(len(ids), dtype=np.int64)
        for i, s in enumerate(t[text_col].to_pylist()):
            toks = str(s).split()
            grams = (
                [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
                if len(toks) >= n
                else ([" ".join(toks)] if toks else [])
            )
            total[i] = len(grams)
            distinct[i] = len(set(grams))
        dup = 1.0 - distinct / np.maximum(total, 1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "ngram_total": pa.array(total),
                "ngram_distinct": pa.array(distinct),
                "dup_frac": pa.array(dup, pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")
