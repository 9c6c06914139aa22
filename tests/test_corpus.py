import pyarrow as pa

from raydex.analysis.html_strip import extract_text
from raydex.corpus import make_pages_table, make_queries_table


def test_schema_and_determinism():
    t1 = make_pages_table(64, seed=42)
    t2 = make_pages_table(64, seed=42)
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t1.equals(t2)
    assert t1.num_rows == 64


def test_extract_invariant_byte_identical():
    t = make_pages_table(128, seed=42)
    htmls = t["html"].to_pylist()
    texts = t["text"].to_pylist()
    for h, want in zip(htmls, texts):
        assert extract_text(h) == want


def test_duplicates_present():
    t = make_pages_table(200, seed=42, dup_frac=0.05)
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)


def test_langs():
    t = make_pages_table(500, seed=42)
    langs = set(t["lang"].to_pylist())
    assert "en" in langs and ("ja" in langs or "de" in langs)


def test_queries_table():
    q = make_queries_table(40)
    assert q.num_rows == 40
    assert q["query_text"][0].as_py() == "the of and"
    assert q.schema.types == [pa.int64(), pa.string(), pa.int32()]
