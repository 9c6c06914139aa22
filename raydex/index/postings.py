"""Block posting-list codec: delta + varint, 128-doc blocks, block-max metadata.

Re-implements from scratch (published Lucene postings-format ideas — the
reference delegates the physical encoding to the Lucene 8.9 jar, see
SURVEY.md §1/§2.1; block size 128 matches Lucene's FOR block size) a
vectorized numpy codec:

- posting lists are split into blocks of <=128 (docid, tf) pairs;
- docids are delta-encoded within a block, the block's FIRST docid is
  stored absolute so every block decodes independently (skip support);
- deltas then tfs are LEB128-varint encoded, ids-region first;
- per block we keep: element count ``n``, ``last_docid`` (absolute),
  ``max_tf``, ``min_dl`` (minimum raw doc length among the block's
  docs), byte ``offset`` into the payload, ``ids_nbytes`` and total
  ``nbytes``.  ``(max_tf, min_dl)`` gives a sound upper bound on any
  BM25 contribution inside the block (score is increasing in tf,
  decreasing in dl) — the block-max metadata driving WAND pruning
  (reference behavior: ``ScoreMode.TOP_SCORES`` block-max impacts,
  ``server/.../search/query/QueryPhase.java:373-395``).

All encode/decode paths are vectorized numpy; no per-posting Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128
_MAX_VARINT_BYTES = 5  # values < 2**35


def _varint_lens(vals: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte count; one pass when everything fits a byte."""
    v = np.asarray(vals)
    if v.size == 0:
        return np.empty(0, dtype=np.int64)
    vmax = int(v.max())
    if vmax < 128:
        return np.ones(v.size, dtype=np.int64)
    n = 1 + (v >= 128).astype(np.int64)
    if vmax >= 128**2:
        n += v >= 128**2
    if vmax >= 128**3:
        n += v >= 128**3
    if vmax >= 128**4:
        n += v >= 128**4
    return n


def varint_encode(vals: np.ndarray, lens: np.ndarray | None = None) -> np.ndarray:
    """LEB128-encode non-negative int array -> uint8 array.

    ``lens`` (from ``_varint_lens``) may be passed to avoid recomputing
    byte counts. Fast path: when every value is < 128 the encoding IS the
    byte cast — one pass, no matrix (tf and in-block delta arrays are
    almost always in this regime, and the matrix path's 5-column
    materialization was the codec's main memory traffic)."""
    v = np.asarray(vals, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    vmax = int(v.max())
    if vmax < 128:
        return v.astype(np.uint8)
    nbytes = lens if lens is not None else _varint_lens(v)
    kmax = 1
    while kmax < _MAX_VARINT_BYTES and vmax >= 128**kmax:
        kmax += 1
    mat = np.empty((n, kmax), dtype=np.uint8)
    for j in range(kmax):
        mat[:, j] = ((v >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
    cols = np.arange(kmax)
    valid = cols[None, :] < nbytes[:, None]
    cont = cols[None, :] < (nbytes - 1)[:, None]
    mat = np.where(cont, mat | 0x80, mat)
    return mat[valid]


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a uint8 buffer of concatenated varints -> int64 array."""
    buf = np.asarray(buf, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(buf < 128)
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(lens.max())):
        sel = lens > j
        b = buf[starts[sel] + j].astype(np.uint64)
        vals[sel] |= (b & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals.astype(np.int64)


def _spans(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Index array [starts[0]..+lens[0], starts[1]..+lens[1], ...]."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep_start = np.repeat(starts, lens)
    csum = np.cumsum(lens) - lens
    return np.arange(total, dtype=np.int64) - np.repeat(csum, lens) + rep_start


@dataclass
class BlockMeta:
    """Per-block metadata arrays + per-term block counts (all numpy)."""

    term_nblocks: np.ndarray  # int32, per term
    n: np.ndarray  # int32, per block
    last_docid: np.ndarray  # int32
    max_tf: np.ndarray  # int32
    min_dl: np.ndarray  # int32
    offset: np.ndarray  # int64, absolute into payload
    ids_nbytes: np.ndarray  # int32
    nbytes: np.ndarray  # int32


def encode_postings(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    term_offsets: np.ndarray,
) -> tuple[np.ndarray, BlockMeta]:
    """Encode concatenated (term-major, docid-sorted) postings.

    ``docids``/``tfs``/``dls`` are parallel arrays over ALL postings of a
    segment; ``term_offsets`` (len nterms+1) delimits each term's run.
    Returns (payload uint8 array, BlockMeta).
    """
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    term_offsets = np.asarray(term_offsets, dtype=np.int64)
    npost = docids.size
    nterms = term_offsets.size - 1
    if npost == 0:
        empty32 = np.empty(0, dtype=np.int32)
        meta = BlockMeta(
            term_nblocks=np.zeros(nterms, dtype=np.int32),
            n=empty32, last_docid=empty32, max_tf=empty32, min_dl=empty32,
            offset=np.empty(0, dtype=np.int64), ids_nbytes=empty32, nbytes=empty32,
        )
        return np.empty(0, dtype=np.uint8), meta

    term_lens = np.diff(term_offsets)
    # index of each posting within its term
    idx_in_term = np.arange(npost, dtype=np.int64) - np.repeat(
        term_offsets[:-1], term_lens
    )
    block_of_posting_in_term = idx_in_term // BLOCK_SIZE
    is_block_start = (idx_in_term % BLOCK_SIZE) == 0

    # deltas (block-start postings carry the absolute docid)
    deltas = np.empty(npost, dtype=np.int64)
    deltas[0] = docids[0]
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[is_block_start] = docids[is_block_start]

    ids_len_per = _varint_lens(deltas)
    tf_len_per = _varint_lens(tfs)
    ids_bytes = varint_encode(deltas, ids_len_per)
    tf_bytes = varint_encode(tfs, tf_len_per)

    block_starts = np.flatnonzero(is_block_start)
    nblocks = block_starts.size
    block_ends = np.empty(nblocks, dtype=np.int64)
    block_ends[:-1] = block_starts[1:]
    block_ends[-1] = npost
    bn = (block_ends - block_starts).astype(np.int32)

    term_nblocks = np.ceil(term_lens / BLOCK_SIZE).astype(np.int32)

    last_docid = docids[block_ends - 1].astype(np.int32)
    max_tf = np.maximum.reduceat(tfs, block_starts).astype(np.int32)
    min_dl = np.minimum.reduceat(dls, block_starts).astype(np.int32)

    ids_nb = np.add.reduceat(ids_len_per, block_starts).astype(np.int64)
    tf_nb = np.add.reduceat(tf_len_per, block_starts).astype(np.int64)
    blk_nbytes = ids_nb + tf_nb
    offset = np.cumsum(blk_nbytes) - blk_nbytes

    # gather the per-posting byte runs into block-interleaved layout
    ids_src_start = np.cumsum(ids_nb) - ids_nb
    tf_src_start = np.cumsum(tf_nb) - tf_nb
    payload = np.empty(int(blk_nbytes.sum()), dtype=np.uint8)
    ids_dest = _spans(offset, ids_nb)
    tf_dest = _spans(offset + ids_nb, tf_nb)
    payload[ids_dest] = ids_bytes[_spans(ids_src_start, ids_nb)]
    payload[tf_dest] = tf_bytes[_spans(tf_src_start, tf_nb)]

    meta = BlockMeta(
        term_nblocks=term_nblocks,
        n=bn,
        last_docid=last_docid,
        max_tf=max_tf,
        min_dl=min_dl,
        offset=offset,
        ids_nbytes=ids_nb.astype(np.int32),
        nbytes=blk_nbytes.astype(np.int32),
    )
    return payload, meta


def decode_block(
    payload: np.ndarray, offset: int, ids_nbytes: int, nbytes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (absolute docids, tfs)."""
    ids = varint_decode(payload[offset : offset + ids_nbytes])
    tfs = varint_decode(payload[offset + ids_nbytes : offset + nbytes])
    return np.cumsum(ids), tfs


def _reassemble(vals: np.ndarray, ns: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[b0 deltas, b0 tfs, b1 deltas, b1 tfs, ...] -> (docids, tfs)."""
    nb = ns.size
    total = int(ns.sum())
    tfs = np.empty(total, dtype=np.int64)
    vstart = np.cumsum(2 * ns) - 2 * ns
    out_start = np.cumsum(ns) - ns
    take_ids = _spans(vstart, ns)
    take_tfs = _spans(vstart + ns, ns)
    deltas = vals[take_ids]
    tfs[:] = vals[take_tfs]
    # per-block cumsum: each block's first delta is its absolute docid, so
    # subtract the running total accumulated before the block starts
    csum = np.cumsum(deltas)
    corr = np.zeros(nb, dtype=np.int64)
    if nb > 1:
        corr[1:] = csum[out_start[1:] - 1]
    docids = csum - np.repeat(corr, ns)
    return docids, tfs


def decode_term(
    payload: np.ndarray,
    offsets: np.ndarray,
    ids_nbytes: np.ndarray,
    nbytes: np.ndarray,
    ns: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode ALL blocks of one term in a single varint pass.

    Blocks of a term are contiguous in the payload; one decode yields
    [b0 deltas, b0 tfs, b1 deltas, b1 tfs, ...], reassembled here.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    nbytes = np.asarray(nbytes, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    start, end = int(offsets[0]), int(offsets[-1] + nbytes[-1])
    vals = varint_decode(payload[start:end])
    return _reassemble(vals, ns)


def decode_blocks(
    payload: np.ndarray,
    offsets: np.ndarray,
    ids_nbytes: np.ndarray,
    nbytes: np.ndarray,
    ns: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode an arbitrary (possibly non-contiguous) SUBSET of blocks in
    one varint pass — the selective-fetch path of the MaxScore scorer:
    the chosen blocks' byte ranges are gathered into one buffer (numpy
    views + one concatenate), then decoded and reassembled exactly like
    ``decode_term``. Per-block Python cost collapses to the gather."""
    offsets = np.asarray(offsets, dtype=np.int64)
    nbytes = np.asarray(nbytes, dtype=np.int64)
    ns = np.asarray(ns, dtype=np.int64)
    buf = np.concatenate(
        [payload[int(o) : int(o) + int(nb)] for o, nb in zip(offsets, nbytes)]
    )
    vals = varint_decode(buf)
    return _reassemble(vals, ns)
