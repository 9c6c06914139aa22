"""Murmur3 document routing — the reference's shard-routing hash, vectorized.

Mirrors ``server/src/main/java/org/elasticsearch/cluster/routing/
OperationRouting.java:220-242`` (``generateShardId`` =
``floorMod(murmur3(routing ?? id), routing_num_shards) / routing_factor``,
with routing_factor 1 here) and ``Murmur3HashFunction.java:22,34``: the
hash is murmur3_x86_32 with seed 0 over the string's **UTF-16LE** code
units (2 bytes per Java char), exactly as the reference computes it.

Two implementations: a scalar reference (property-test oracle) and a
numpy row-vectorized version used in the build pipeline's hot path.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def murmur3_hash_str(s: str, seed: int = 0) -> int:
    """Scalar murmur3_x86_32 over UTF-16LE bytes (signed int32 result)."""
    data = s.encode("utf-16-le")
    n = len(data)
    h = seed & 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    m = 0xFFFFFFFF
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
        h = ((h << 13) | (h >> 19)) & m
        h = (h * 5 + 0xE6546B64) & m
    k = 0
    tail = data[nblocks * 4 :]
    for j in range(len(tail) - 1, -1, -1):
        k ^= tail[j] << (8 * j)
    if tail:
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_hash_many(strings) -> np.ndarray:
    """Row-vectorized murmur3_x86_32 (seed 0, UTF-16LE) -> int32 array."""
    encoded = [s.encode("utf-16-le") for s in strings]
    n = len(encoded)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    pad = int(max(4, (lens.max() + 3) // 4 * 4))
    arr = np.zeros((n, pad), dtype=np.uint8)
    flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    row_idx = np.repeat(np.arange(n), lens)
    col_idx = np.arange(flat.shape[0]) - np.repeat(starts, lens)
    arr[row_idx, col_idx] = flat

    chunks = arr.view("<u4")
    nblocks = (lens // 4).astype(np.int64)
    h = np.zeros(n, dtype=np.uint32)
    s15, s17, s13, s19 = (np.uint32(x) for x in (15, 17, 13, 19))
    for j in range(chunks.shape[1]):
        active = nblocks > j
        if not active.any():
            break
        k = chunks[:, j] * _C1
        k = (k << s15) | (k >> s17)
        k = k * _C2
        h2 = h ^ k
        h2 = (h2 << s13) | (h2 >> s19)
        h2 = h2 * np.uint32(5) + np.uint32(0xE6546B64)
        h = np.where(active, h2, h)

    rem = (lens % 4).astype(np.int64)
    tail_start = nblocks * 4
    k1 = np.zeros(n, dtype=np.uint32)
    rows = np.arange(n)
    for j in (2, 1, 0):
        mask = rem > j
        if mask.any():
            vals = arr[rows, np.minimum(tail_start + j, pad - 1)].astype(np.uint32)
            k1 = np.where(mask, k1 ^ (vals << np.uint32(8 * j)), k1)
    km = k1 * _C1
    km = (km << s15) | (km >> s17)
    km = km * _C2
    h = np.where(rem > 0, h ^ km, h)

    h = h ^ lens.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h *= np.uint32(0x85EBCA6B)
    h ^= h >> np.uint32(13)
    h *= np.uint32(0xC2B2AE35)
    h ^= h >> np.uint32(16)
    return h.view(np.int32)


def route_partitions(strings, num_partitions: int) -> np.ndarray:
    """``floorMod(murmur3(id), P)`` — deterministic partition per doc key."""
    h = murmur3_hash_many(strings).astype(np.int64)
    return (h % num_partitions).astype(np.int32)  # numpy % is floor-mod
