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
