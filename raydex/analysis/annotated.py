"""annotated_text field analyzer (the mapper-annotated-text plugin,
``plugins/mapper-annotated-text/.../AnnotatedTextFieldMapper.java``).

Markup ``[visible text](value1&value2)`` injects the url-decoded
annotation VALUES as extra tokens at the SAME position as the first
token of the annotated span (position-increment 0, like index-time
synonyms), so

    "[Paris](Q90) is the capital"

indexes tokens ``paris``(0) ``Q90``(0) ``is``(1) ``the``(2)
``capital``(3): a term query for ``Q90`` finds the doc, and phrase /
span queries over the plain tokens behave as if the markup were absent.

Deviations from the reference, documented: the plain text is analyzed
with the non-stop ``standard`` analyzer (position math stays ordinal),
and doc length norms COUNT the injected tokens (Lucene's
discountOverlaps would exclude position-increment-0 tokens).
"""

from __future__ import annotations

import re
import urllib.parse

from raydex.analysis.tokenizer import register_analyzer, standard_analyze

_ANN_RE = re.compile(r"\[([^\]]*)\]\(([^)]+)\)")


def annotated_analyze_with_positions(text: str):
    """(tokens, positions): plain tokens at ordinal positions,
    annotation values injected at their span's first position. The
    emission order keeps positions non-decreasing (annotations follow
    the first inner token immediately), so per-posting position lists
    stay sorted."""
    tokens: list[str] = []
    positions: list[int] = []
    pos = 0
    last = 0
    for m in _ANN_RE.finditer(text):
        for tok in standard_analyze(text[last:m.start()]):
            tokens.append(tok)
            positions.append(pos)
            pos += 1
        inner = standard_analyze(m.group(1))
        anns = [
            urllib.parse.unquote(a.strip())
            for a in m.group(2).split("&")
            if a.strip()
        ]
        if inner:
            start = pos
            tokens.append(inner[0])
            positions.append(pos)
            pos += 1
            for a in anns:  # same-position injection (posIncr 0)
                tokens.append(a)
                positions.append(start)
            for tok in inner[1:]:
                tokens.append(tok)
                positions.append(pos)
                pos += 1
        elif anns:
            # span text analyzes to nothing (empty / punctuation-only):
            # the annotations still index, occupying one position
            for a in anns:
                tokens.append(a)
                positions.append(pos)
            pos += 1
        last = m.end()
    for tok in standard_analyze(text[last:]):
        tokens.append(tok)
        positions.append(pos)
        pos += 1
    return tokens, positions


def annotated_analyze(text: str) -> list[str]:
    return annotated_analyze_with_positions(text)[0]


register_analyzer(
    "annotated_text", annotated_analyze,
    with_positions_fn=annotated_analyze_with_positions,
)
