import numpy as np
import pytest

from raydex.index.postings import (
    BLOCK_SIZE,
    decode_block,
    decode_term,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_round_trip():
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            np.array([0, 1, 127, 128, 129, 16383, 16384, 2**21 - 1, 2**21, 2**28, 2**34]),
            rng.integers(0, 2**31, size=5000),
        ]
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_decode(varint_encode(np.array([], dtype=np.int64))).size == 0


def _rand_postings(rng, nterms, ndocs):
    """Random segment-shaped postings: per term a sorted docid subset."""
    docids, tfs, offs = [], [], [0]
    for _ in range(nterms):
        df = int(rng.integers(1, min(ndocs, 400)))
        ids = np.sort(rng.choice(ndocs, size=df, replace=False))
        docids.append(ids)
        tfs.append(rng.integers(1, 50, size=df))
        offs.append(offs[-1] + df)
    return (
        np.concatenate(docids),
        np.concatenate(tfs),
        np.array(offs, dtype=np.int64),
    )


def test_encode_decode_round_trip():
    rng = np.random.default_rng(1)
    ndocs = 3000
    dls_by_doc = rng.integers(1, 500, size=ndocs)
    docids, tfs, offs = _rand_postings(rng, 30, ndocs)
    payload, meta = encode_postings(docids, tfs, dls_by_doc[docids], offs)

    blk_start = np.cumsum(meta.term_nblocks) - meta.term_nblocks
    for t in range(offs.size - 1):
        nb = int(meta.term_nblocks[t])
        s = int(blk_start[t])
        got_ids, got_tfs = decode_term(
            payload,
            meta.offset[s : s + nb],
            meta.ids_nbytes[s : s + nb],
            meta.nbytes[s : s + nb],
            meta.n[s : s + nb],
        )
        want_ids = docids[offs[t] : offs[t + 1]]
        want_tfs = tfs[offs[t] : offs[t + 1]]
        assert np.array_equal(got_ids, want_ids)
        assert np.array_equal(got_tfs, want_tfs)


def test_block_metadata_sound():
    rng = np.random.default_rng(2)
    ndocs = 2000
    dls_by_doc = rng.integers(1, 300, size=ndocs)
    docids, tfs, offs = _rand_postings(rng, 10, ndocs)
    payload, meta = encode_postings(docids, tfs, dls_by_doc[docids], offs)
    blk_start = np.cumsum(meta.term_nblocks) - meta.term_nblocks
    for t in range(offs.size - 1):
        nb = int(meta.term_nblocks[t])
        s = int(blk_start[t])
        for b in range(nb):
            ids, bf = decode_block(
                payload,
                int(meta.offset[s + b]),
                int(meta.ids_nbytes[s + b]),
                int(meta.nbytes[s + b]),
            )
            assert ids.size == meta.n[s + b] <= BLOCK_SIZE
            assert ids[-1] == meta.last_docid[s + b]
            assert bf.max() == meta.max_tf[s + b]
            assert dls_by_doc[ids].min() == meta.min_dl[s + b]
            assert np.all(np.diff(ids) > 0)


def test_single_posting_and_exact_block_boundary():
    dls = np.full(400, 7)
    # term with exactly BLOCK_SIZE and BLOCK_SIZE+1 postings
    for df in (1, BLOCK_SIZE, BLOCK_SIZE + 1, 2 * BLOCK_SIZE):
        ids = np.arange(df) * 3
        tfs = np.ones(df, dtype=np.int64)
        payload, meta = encode_postings(
            ids, tfs, np.full(df, 7), np.array([0, df])
        )
        got_ids, got_tfs = decode_term(
            payload, meta.offset, meta.ids_nbytes, meta.nbytes, meta.n
        )
        assert np.array_equal(got_ids, ids)
        assert meta.term_nblocks[0] == -(-df // BLOCK_SIZE)


def test_empty_segment():
    payload, meta = encode_postings(
        np.array([]), np.array([]), np.array([]), np.array([0])
    )
    assert payload.size == 0 and meta.term_nblocks.size == 0
