"""raydex — Ray-Data-native fulltext index + BM25 search engine.

A from-scratch re-implementation of the indexing-and-search core of the
reference (Elasticsearch 8.0.0-dev / Lucene 8.9, `/root/reference`),
expressed as idiomatic Ray Data pipelines:

- ``raydex.analysis``  — standard analyzer (UAX#29 word-break, lowercase,
  stop filter), HTML strip char filter, SmallFloat norm quantization.
- ``raydex.index``     — inverted-index build (varint/FOR block postings,
  sorted term dictionaries, block-max metadata), segment merge as a
  term-hash shuffle, checkpoint manifests + resume.
- ``raydex.search``    — BM25 (k1=1.2, b=0.75, Lucene-8 formula),
  brute-force and block-max-WAND top-k, distributed scatter-gather.
- ``raydex.ops``       — training-data-pipeline operators (dedup families,
  similarity search, text quality, ingest-processor analogues, aggs).

Never calls ``ray.init`` — the caller owns the Ray session.
"""

__version__ = "0.1.0"

# Public API re-exports (the "switch from the reference" surface): the
# index lifecycle + search classes a user touches day to day. Modules
# stay importable directly for everything else.
from raydex.index.build import build_index, load_index_manifest  # noqa: E402,F401
from raydex.index.segment import FieldSpec  # noqa: E402,F401


def __getattr__(name):  # lazy: keep `import raydex` light
    lazy = {
        "LocalSearcher": ("raydex.search.scatter", "LocalSearcher"),
        "RaySearcher": ("raydex.search.scatter", "RaySearcher"),
        "ReplicatedSearcher": ("raydex.search.scatter", "ReplicatedSearcher"),
        "AliasRegistry": ("raydex.index.aliases", "AliasRegistry"),
        "delete_by_query": ("raydex.index.deletes", "delete_by_query"),
        "expunge_deletes": ("raydex.index.compact", "expunge_deletes"),
        "clone_index": ("raydex.index.reshape", "clone_index"),
        "shrink_index": ("raydex.index.reshape", "shrink_index"),
        "split_index": ("raydex.index.reshape", "split_index"),
        "merge_index": ("raydex.index.merge", "merge_index"),
        "get_doc": ("raydex.search.get", "get_doc"),
        "mget": ("raydex.search.get", "mget"),
        # round-3 tail: nested/collapse aggs + shuffle guard
        "nest": ("raydex.ops.nested", "nest"),
        "nested_terms_agg": ("raydex.ops.nested", "nested_terms_agg"),
        "reverse_nested_counts": ("raydex.ops.nested", "reverse_nested_counts"),
        "collapse_top_rows": ("raydex.ops.aggs", "collapse_top_rows"),
        "scoped_hash_shuffle": ("raydex.shuffle", "scoped_hash_shuffle"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'raydex' has no attribute {name!r}")
