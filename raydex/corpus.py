"""Deterministic synthetic web-page corpus (BASELINE.json input_hint shape).

Generates the ``pages`` table ``(url:string, warc_ts:timestamp[us],
html:binary, text:large_string, lang:string)`` described in FIXTURES.md §1
plus the reference query set (§2), with seed-42 determinism and no
wall-clock. The HTML wraps the ground-truth ``text`` with tags, entities,
``<script>/<style>`` blocks and comments such that
``raydex.analysis.html_strip.extract_text(html) == text`` **byte-identically**
per url — the per-row invariant the build pipeline verifies.

Text is drawn from a zipfian vocabulary (head terms create realistic
posting-list skew for merge/WAND stress); a small fraction of urls are
emitted twice with a later ``warc_ts`` and different text to exercise
latest-wins dedup; a few ``de``/``ja`` rows exercise non-Latin analysis.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# deterministic base vocabulary: stopword-ish heads + synthetic tail
_STOPWORDS = (
    "the of and a to in is it you that he was for on are as with his they i".split()
)
_COMMON = (
    "web search engine index data query page document ranking score text "
    "cluster node shard segment merge token analysis filter term frequency "
    "vector model learning neural network train corpus crawl link site "
    "content server cache store read write batch stream shuffle partition".split()
)
_JA = "日本語 テキスト 検索 エンジン これ は ペン です".split()
_DE = "der die das und ist ein eine nicht mit von suche maschine".split()


def _vocab(size: int) -> list[str]:
    v = list(_STOPWORDS) + list(_COMMON)
    v += [f"term{i}" for i in range(size - len(v))]
    return v


def _zipf_probs(n: int) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = 1.0 / ranks
    return p / p.sum()


def _make_text(rng: np.random.Generator, words: np.ndarray) -> str:
    # words already sampled; lay out as sentences with punctuation/newlines
    out = []
    i = 0
    n = len(words)
    while i < n:
        slen = int(rng.integers(4, 15))
        sent = " ".join(words[i : i + slen])
        out.append(sent.capitalize() + rng.choice([".", ".", "!", "?"]))
        i += slen
    # paragraphs of ~5 sentences
    paras = [" ".join(out[j : j + 5]) for j in range(0, len(out), 5)]
    return "\n".join(paras)


def _escape_html(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _text_to_html(text: str, rng: np.random.Generator) -> bytes:
    """Wrap text in HTML that extract_text() round-trips byte-identically."""
    body = _escape_html(text).replace("\n", "<br>")
    # sprinkle an entity variant: encode a few apostrophes numerically
    if "'" in body and rng.random() < 0.5:
        body = body.replace("'", "&#x27;", 1)
    comment = "<!-- generated: id=%d -->" % rng.integers(0, 1 << 30)
    style = "<style>body { font-size: %dpx; }</style>" % rng.integers(8, 20)
    script = "<script>var t = %d; if (t) { t += 1; }</script>" % rng.integers(0, 99)
    html = (
        "<html><head>"
        + style
        + "</head><body class=\"c%d\">" % rng.integers(0, 9)
        + comment
        + "<div><p>"
        + body
        + "</p></div>"
        + script
        + "</body></html>"
    )
    return html.encode("utf-8")


def make_pages_table(
    n_rows: int,
    seed: int = 42,
    vocab_size: int = 50_000,
    dup_frac: float = 0.03,
    big_rows: int = 0,
    with_html: bool = True,
    id_offset: int = 0,
) -> pa.Table:
    """Deterministic pages table; ~``dup_frac`` of urls duplicated with a
    later warc_ts (latest-wins dedup fixtures), ``big_rows`` multi-100KB
    rows (wide-record path)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(vocab_size), dtype=object)
    probs = _zipf_probs(vocab_size)

    n_base = n_rows - int(n_rows * dup_frac)
    urls, texts, langs, ts = [], [], [], []
    base_ts = np.int64(1_700_000_000_000_000)  # 2023-11-14 UTC, microseconds

    # pre-sample all words in one draw for speed
    doc_lens = rng.integers(30, 220, size=n_base)
    if big_rows:
        big_idx = rng.choice(n_base, size=min(big_rows, n_base), replace=False)
        doc_lens[big_idx] = 60_000  # ~400KB text
    all_words = rng.choice(vocab, size=int(doc_lens.sum()), p=probs)
    pos = 0
    for i in range(n_base):
        gid = id_offset + i
        url = f"https://site{gid % 97}.example/p/{gid}"
        lang_roll = rng.random()
        if lang_roll < 0.02:
            words = rng.choice(np.array(_JA, dtype=object), size=int(rng.integers(8, 30)))
            lang = "ja"
        elif lang_roll < 0.05:
            words = rng.choice(np.array(_DE, dtype=object), size=int(rng.integers(20, 80)))
            lang = "de"
        else:
            words = all_words[pos : pos + doc_lens[i]]
            lang = "en"
        pos += doc_lens[i]
        urls.append(url)
        texts.append(_make_text(rng, words))
        langs.append(lang)
        ts.append(base_ts + i * 1_000_000)

    # duplicates: same url, later warc_ts, different text (latest wins)
    n_dup = n_rows - n_base
    dup_src = rng.choice(n_base, size=n_dup, replace=False)
    for j, src in enumerate(dup_src):
        urls.append(urls[src])
        words = rng.choice(vocab, size=int(rng.integers(30, 120)), p=probs)
        texts.append(_make_text(rng, words))
        langs.append(langs[src])
        ts.append(base_ts + (n_base + j) * 1_000_000)

    # shuffle row order deterministically (duplicates interleaved)
    order = rng.permutation(n_rows)
    urls = [urls[i] for i in order]
    texts = [texts[i] for i in order]
    langs = [langs[i] for i in order]
    ts = [ts[i] for i in order]

    cols: dict = {
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(np.asarray(ts, dtype=np.int64)).cast(pa.timestamp("us")),
    }
    if with_html:
        cols["html"] = pa.array(
            [_text_to_html(t, rng) for t in texts], type=pa.binary()
        )
    cols["text"] = pa.array(texts, type=pa.large_string())
    cols["lang"] = pa.array(langs, type=pa.string())
    return pa.table(cols)


def make_queries_table(n_queries: int = 60, seed: int = 43, vocab_size: int = 50_000) -> pa.Table:
    """Reference query set (FIXTURES.md §2): 1-5 term match queries —
    head terms, rare terms, absent terms, stopword-only, mixed."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)
    qs: list[str] = [
        "the of and",  # stopword-only under _english_-style sets
        "search engine",
        "zzzmissingterm",  # absent from corpus
        "the search",  # head + mid
    ]
    while len(qs) < n_queries:
        nt = int(rng.integers(1, 6))
        kind = rng.random()
        if kind < 0.4:
            idx = rng.integers(0, 60, size=nt)  # head-heavy
        elif kind < 0.8:
            idx = rng.integers(0, 2000, size=nt)
        else:
            idx = rng.integers(0, vocab_size, size=nt)  # deep tail / maybe absent
        qs.append(" ".join(vocab[i] for i in idx))
    ks = [10] * len(qs)
    ks[1], ks[2] = 1, 100
    return pa.table(
        {
            "qid": pa.array(range(len(qs)), type=pa.int64()),
            "query_text": pa.array(qs, type=pa.string()),
            "k": pa.array(ks, type=pa.int32()),
        }
    )


def pages_dir(
    n_rows: int,
    seed: int = 42,
    shards: int = 32,
    root: str = "/tmp/raydex_corpus",
    with_html: bool = False,
    use_ray: bool = True,
) -> str:
    """Sharded, cached bench corpus: ``shards`` parquet files generated in
    parallel (Ray tasks), each deterministically seeded (seed + shard) —
    identical output at any parallelism. Existing shards are skipped
    (resume semantics)."""
    tag = f"pages_n{n_rows}_s{seed}_sh{shards}" + ("_html" if with_html else "")
    out = os.path.join(root, tag)
    os.makedirs(out, exist_ok=True)
    per = -(-n_rows // shards)
    missing = []
    for i in range(shards):
        rows = min(per, n_rows - i * per)
        if rows <= 0:
            break
        path = os.path.join(out, f"shard-{i:04d}.parquet")
        if not os.path.exists(path):
            missing.append((i, rows, path))
    if not missing:
        return out

    def gen(i: int, rows: int, path: str) -> str:
        tbl = make_pages_table(
            rows, seed=seed + i, with_html=with_html, id_offset=i * per
        )
        pq.write_table(tbl, path + ".tmp", row_group_size=max(1024, rows // 4))
        os.replace(path + ".tmp", path)
        return path

    if use_ray:
        import ray

        rgen = ray.remote(gen)
        ray.get([rgen.remote(i, r, p) for i, r, p in missing])
    else:
        for i, r, p in missing:
            gen(i, r, p)
    return out


def pages_path(n_rows: int, seed: int = 42, root: str = "/tmp/raydex_corpus", **kw) -> str:
    """Write-once cached parquet for a given (n_rows, seed) — bench/test input."""
    os.makedirs(root, exist_ok=True)
    tag = f"pages_n{n_rows}_s{seed}" + ("_big" if kw.get("big_rows") else "")
    path = os.path.join(root, tag + ".parquet")
    if not os.path.exists(path):
        tbl = make_pages_table(n_rows, seed=seed, **kw)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp, row_group_size=max(1024, n_rows // 32))
        os.replace(tmp, path)
    return path
