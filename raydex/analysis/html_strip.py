"""HTMLStripCharFilter-equivalent text extraction.

Re-implements (from public HTML semantics, not the reference source) the
behavior of the reference's ``html_strip``
(``modules/ingest-common/src/main/java/org/elasticsearch/ingest/common/HtmlStripProcessor.java:18,34``
and the analysis char filter
``modules/analysis-common/.../HtmlStripCharFilterFactory.java:39``):

  - ``<!-- comments -->`` removed;
  - ``<script>``/``<style>`` elements removed INCLUDING content;
  - all other tags removed; ``<br>`` variants emit a newline
    (visibility break);
  - character entities decoded (named via ``html.unescape`` semantics,
    plus ``&#NNN;`` / ``&#xHH;`` numeric forms).

The per-row build invariant (BASELINE.json input_hint) is
``extract_text(html) == text`` byte-identically for every url; the
deterministic corpus generator (``raydex.corpus``) produces HTML whose
extraction round-trips exactly, and ``tests/test_html_strip.py`` holds
golden cases for the stripper itself.
"""

from __future__ import annotations

import html as _html

import regex

# One scanning pass: comments / script / style / br / any tag.
_STRIP_RE = regex.compile(
    r"(?is)"
    r"<!--.*?-->"
    r"|<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<br\s*/?>"
    r"|</?[a-zA-Z!][^>]*>"
)


def _replace(m: regex.Match) -> str:
    s = m.group(0)
    if s[:3].lower() == "<br":
        return "\n"
    return ""


def extract_text(html_doc: str | bytes) -> str:
    """Strip tags/scripts/styles/comments and decode entities."""
    if isinstance(html_doc, (bytes, bytearray)):
        html_doc = html_doc.decode("utf-8", errors="replace")
    stripped = _STRIP_RE.sub(_replace, html_doc)
    return _html.unescape(stripped)


def extract_text_many(html_docs) -> list[str]:
    return [extract_text(h) for h in html_docs]
