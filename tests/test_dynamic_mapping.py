"""Dynamic mapping inference on the NDJSON `_bulk` path: unknown JSON
keys get index-time mapped fields from their token types (the
reference's DynamicFieldsBuilder.java / DynamicTemplate.java; test shape
mirrors rest-api-spec bulk/10_basic.yml — ingest schema-free docs, then
query the inferred fields)."""

import json

import pyarrow as pa
import pytest

from raydex.index.build import build_index, infer_dynamic_fields
from raydex.search.scatter import LocalSearcher


def test_infer_from_arrow_types():
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("text", pa.large_string()),
            ("title", pa.string()),
            ("views", pa.int64()),
            ("score", pa.float64()),
            ("flag", pa.bool_()),
            ("tags", pa.list_(pa.string())),  # nested: skipped
        ]
    )
    specs = {s.name: s for s in infer_dynamic_fields(schema)}
    assert set(specs) == {"title", "views", "score", "flag"}
    assert specs["title"].analyzer == "standard"  # JSON string -> text
    assert specs["views"].analyzer == "keyword"  # JSON number -> exact
    assert specs["flag"].analyzer == "keyword"


@pytest.fixture(scope="module")
def ndjson_index(ray_session, tmp_path_factory):
    rows = [
        {
            "url": f"doc-{i:03d}",
            "warc_ts": f"2024-01-{(i % 27) + 1:02d}T00:00:00",
            "text": f"body text number {i} with shared words",
            "title": f"Report {i % 4} quarterly summary",
            "views": i % 5,
        }
        for i in range(40)
    ]
    p = tmp_path_factory.mktemp("djson") / "docs.ndjson"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    idx = str(tmp_path_factory.mktemp("didx") / "index")
    m = build_index(str(p), idx, num_partitions=2, analyzer="standard",
                    source="text", max_docs_per_segment=10,
                    dynamic_fields=True)
    return idx, m, rows


def test_ndjson_dynamic_fields_queryable(ndjson_index):
    idx, m, rows = ndjson_index
    assert set(m["fields"]) == {"title", "views"}
    s = LocalSearcher(idx)
    # inferred text field: analyzed match
    n_q0 = sum(1 for r in rows if r["title"].split()[1] == "0")
    assert s.count({"match": {"title": "report 0"}}) == len(rows)  # 'report' everywhere
    assert s.count({"bool": {"must": [{"term": {"title": "0"}}]}}) == n_q0
    # inferred keyword field over an int literal: exact term
    n_v3 = sum(1 for r in rows if r["views"] == 3)
    assert s.count({"term": {"views": "3"}}) == n_v3
    assert s.count({"term": {"views": "99"}}) == 0
    # multi_match spans primary text + the inferred title field
    hits = s.search_query(
        {"multi_match": {"query": "quarterly shared", "fields": ["text", "title"]}},
        k=40,
    )
    assert len(hits) == 40  # every doc matches one side or the other
