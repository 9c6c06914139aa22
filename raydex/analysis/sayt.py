"""search_as_you_type field type (mapper-extras
``SearchAsYouTypeFieldMapper.java:71-194,639-688``).

The reference indexes a root text field plus dedicated sub-fields:

- ``<root>._2gram`` .. ``._<max>gram``: FixedShingleFilter of exactly
  size n (no unigrams), space-separated;
- ``<root>._index_prefix``: the max-size shingles with ``max-1``
  trailing EMPTY filler tokens (TrailingShingleTokenFilter, so every
  source token heads a shingle), then EdgeNGramTokenFilter(min=1,
  max=20, preserveOriginal=true) — every typed prefix of any
  in-document word sequence is a TERM in this field, turning the
  bool_prefix last-term rewrite into a single term lookup instead of a
  term-dict prefix expansion.

Here each sub-field is an ordinary index-time :class:`FieldSpec` (its
own postings/norms under ``<seg>/field=<name>/``), so every query
feature works over them unchanged; the dedicated acceleration is wired
in ``SegmentEvaluator``'s MatchBoolPrefix leaf (query.py), which
term-looks-up the last term on ``<field>._index_prefix`` when present.
"""

from __future__ import annotations

from raydex.analysis.tokenizer import register_analyzer, standard_analyze

MIN_GRAM, MAX_GRAM = 1, 20  # SearchAsYouTypeFieldMapper.Defaults
MAX_SHINGLE_LOWER, MAX_SHINGLE_UPPER = 2, 4


def fixed_shingles(tokens: list[str], size: int) -> list[str]:
    """FixedShingleFilter: only shingles of exactly ``size``."""
    return [" ".join(tokens[i : i + size]) for i in range(len(tokens) - size + 1)]


def sayt_shingle_analyze(text: str, size: int) -> list[str]:
    return fixed_shingles(standard_analyze(text), size)


def sayt_prefix_analyze(text: str, size: int) -> list[str]:
    """Trailing-filler shingles + edge n-grams (preserve_original)."""
    toks = standard_analyze(text)
    if not toks:
        return []
    toks = toks + [""] * (size - 1)  # TrailingShingleTokenFilter
    out: list[str] = []
    for s in fixed_shingles(toks, size):
        hi = min(MAX_GRAM, len(s))
        out.extend(s[:n] for n in range(MIN_GRAM, hi + 1))
        if len(s) > MAX_GRAM:  # preserveOriginal=true
            out.append(s)
    return out


def _register_all() -> None:
    for n in range(MAX_SHINGLE_LOWER, MAX_SHINGLE_UPPER + 1):
        register_analyzer(f"sayt_{n}gram", lambda t, n=n: sayt_shingle_analyze(t, n))
        register_analyzer(f"sayt_prefix_{n}", lambda t, n=n: sayt_prefix_analyze(t, n))


_register_all()


def sayt_subfield_specs(root: str, source: str, max_shingle_size: int = 3):
    """FieldSpecs for a search_as_you_type field's sub-fields. The root
    field itself is either the primary analyzed text (``root='text'``)
    or an extra ``FieldSpec(root, source, 'standard')`` the caller adds."""
    from raydex.index.segment import FieldSpec

    if not MAX_SHINGLE_LOWER <= max_shingle_size <= MAX_SHINGLE_UPPER:
        raise ValueError(
            f"max_shingle_size must be in [{MAX_SHINGLE_LOWER}, "
            f"{MAX_SHINGLE_UPPER}], got {max_shingle_size}"
        )
    specs = [
        FieldSpec(f"{root}._{n}gram", source, f"sayt_{n}gram")
        for n in range(2, max_shingle_size + 1)
    ]
    specs.append(
        FieldSpec(f"{root}._index_prefix", source, f"sayt_prefix_{max_shingle_size}")
    )
    return specs
