"""Connected components over near-dup pairs + survivor dedup
(min-label propagation, the MapReduce-CC family) — checked against a
driver-side union-find oracle."""

import numpy as np
import pyarrow as pa
import pytest

from raydex.ops.dedup import connected_components, dedup_by_components


def _uf_oracle(pairs, nodes=None):
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    labels = {}
    for n in (nodes or parent):
        labels[n] = find(n)
    # canonical: label = min member of the component
    comp_min: dict = {}
    for n, r in labels.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[r] for n, r in labels.items()}


def _pairs_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id_a": pa.array([p[0] for p in pairs], pa.int64()),
        "id_b": pa.array([p[1] for p in pairs], pa.int64()),
    }))


# max_driver_edges=0 forces the distributed label-propagation loop so
# both the driver-sized exact path and the 100 TB-shaped path stay
# covered by the same oracles
@pytest.mark.parametrize("cap", [5_000_000, 0], ids=["local", "distributed"])
def test_chain_star_and_singleton(ray_session, cap):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (7, 8), (8, 9)]
    got = dict(connected_components(_pairs_ds(pairs), max_driver_edges=cap)
               .to_pandas()[["doc_id", "component"]].itertuples(index=False))
    assert got == _uf_oracle(pairs)


@pytest.mark.parametrize("cap", [5_000_000, 0], ids=["local", "distributed"])
def test_random_graphs_match_union_find(ray_session, cap):
    rng = np.random.default_rng(13)
    for trial in range(2):
        n = 60
        m = 45
        pairs = [(int(a), int(b)) for a, b in
                 rng.integers(0, n, size=(m, 2)) if a != b]
        got = dict(connected_components(_pairs_ds(pairs),
                                        max_driver_edges=cap)
                   .to_pandas()[["doc_id", "component"]]
                   .itertuples(index=False))
        assert got == _uf_oracle(pairs), f"trial {trial}"


def test_dedup_by_components_end_to_end(ray_session):
    """Full pipeline: planted duplicate texts -> MinHash LSH pairs ->
    components -> ONE survivor per cluster + all singletons."""
    import ray.data as rd

    from raydex.ops.dedup import minhash_lsh_pairs

    texts = []
    for i in range(60):
        if i % 5 == 0 and i >= 5:
            texts.append(texts[i - 5])     # every 5th doc repeats
        else:
            texts.append(" ".join(
                f"unique{i}word{j}andmore{(i * 7 + j) % 97}"
                for j in range(30)))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(60)), pa.int64()),
        "text": pa.array(texts),
    }))
    pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                              jaccard_threshold=0.9,
                              texts_lookup=dict(enumerate(texts)))
    kept = sorted(dedup_by_components(docs, pairs, "doc_id")
                  .to_pandas()["doc_id"])
    # oracle: exact-text groups keep their min id
    seen: dict = {}
    want = []
    for i, t in enumerate(texts):
        if t not in seen:
            seen[t] = i
            want.append(i)
    assert kept == sorted(want)


def test_cc_numpy_long_chain_and_shapes():
    """The pointer-jumping doubling must collapse a long chain (worst
    case for plain min-propagation) and mixed shapes to single labels
    without Ray."""
    from raydex.ops.dedup import _cc_numpy

    n = 10_000
    a = np.arange(n - 1, dtype=np.int64)
    b = np.arange(1, n, dtype=np.int64)
    ids, labs = _cc_numpy(a, b)
    assert (labs == 0).all() and len(ids) == n
    # two stars + a bridge + a far singleton pair
    pairs = np.array([[100, 1], [100, 2], [100, 3],
                      [200, 201], [200, 202], [3, 201],
                      [900, 901]], dtype=np.int64)
    ids, labs = _cc_numpy(pairs[:, 0], pairs[:, 1])
    got = dict(zip(ids.tolist(), labs.tolist()))
    assert {got[x] for x in (1, 2, 3, 100, 200, 201, 202)} == {1}
    assert got[900] == got[901] == 900
