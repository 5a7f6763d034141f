"""Sharded cuckoo filter — the deletion-capable URL-seen alternative.

BASELINE.json's north_rule names a "partitioned bloom/cuckoo URL-seen
filter"; `functions/bloom.py` is the default backend, this module is the
cuckoo option (Fan, Andersen, Kaminsky, Mitzenmacher, CoNEXT'14). Same
sharding and probe contract as the bloom backend — shard by
``pmod(xxhash64(url), n_shards)``, base hashes computed JVM-side, a
positive is only a candidate (exactly re-checked), a negative is
definitive (no false negatives for inserted keys) — plus the property
bloom cannot offer: O(1) DELETE, so recrawl maintenance can evict
retired URLs (expired pages, mirror-collapsed hosts) from the seen
state without rebuilding the filter.

Layout: ``n_buckets`` (power of two) buckets × 4 slots of 16-bit
fingerprints; fp = (h2 mod 65535) + 1 (never 0 = empty). Alternate
bucket via the partial-key property i2 = i1 XOR spread(fp), so either
bucket is recoverable from the other and the stored fingerprint alone.

Vectorization: PROBE (the per-round hot path) is pure numpy — candidate
buckets gathered and compared in one shot. INSERT (delta-only, new keys
per round) runs vectorized waves that place one key per target bucket
per wave; only keys whose BOTH buckets are full fall back to the
per-key eviction loop, which at the designed ≤50% occupancy touches a
vanishing fraction of inserts. At 10^10 URLs / 4096 shards ≈ 2.4M
keys/shard: n_buckets = 2^20 × 4 slots = 4.2M slots (8 MiB/shard,
~58% max occupancy) with 16-bit fingerprints gives FP ≈ 0.05% per probe
pair — an order cheaper in re-check volume than the 4 MiB bloom at the
same shard count, for 2× the bytes.
"""

from __future__ import annotations

import numpy as np

BUCKET_SLOTS = 4
MAX_KICKS = 500
_SPREAD = np.uint64(0x5BD1E9955BD1E995)


def empty_filter(n_buckets: int) -> bytes:
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    return np.zeros(n_buckets * BUCKET_SLOTS, dtype=np.uint16).tobytes()


def _fp(h2: np.ndarray) -> np.ndarray:
    return (h2.astype(np.uint64) % np.uint64(65535) + np.uint64(1)).astype(
        np.uint16)


def _i1(h1: np.ndarray, n_buckets: int) -> np.ndarray:
    return (h1.astype(np.uint64) & np.uint64(n_buckets - 1)).astype(np.int64)


def _alt(i: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    spread = (fp.astype(np.uint64) * _SPREAD) & np.uint64(n_buckets - 1)
    return (i.astype(np.uint64) ^ spread).astype(np.int64)


def insert(filter_bytes: bytes, h1: np.ndarray, h2: np.ndarray,
           n_buckets: int) -> bytes:
    """Insert keys; returns new filter bytes. Raises RuntimeError when a
    key cannot be placed within MAX_KICKS (filter past design load —
    size n_buckets up, exactly like a bloom sized too small saturates)."""
    slots = np.frombuffer(filter_bytes, dtype=np.uint16).reshape(
        n_buckets, BUCKET_SLOTS).copy()
    counts = (slots != 0).sum(axis=1).astype(np.int64)
    fp = _fp(h2)
    i1 = _i1(h1, n_buckets)
    i2 = _alt(i1, fp, n_buckets)

    pending_fp, pending_i1, pending_i2 = fp, i1, i2
    while len(pending_fp):
        # one placement per distinct target bucket per wave (first-fit,
        # deterministic: numpy unique keeps the first occurrence)
        prefer1 = counts[pending_i1] < BUCKET_SLOTS
        target = np.where(prefer1, pending_i1, pending_i2)
        placeable = prefer1 | (counts[pending_i2] < BUCKET_SLOTS)
        if not placeable.any():
            break
        t_idx = np.flatnonzero(placeable)
        _, first = np.unique(target[t_idx], return_index=True)
        chosen = t_idx[first]
        b = target[chosen]
        slots[b, counts[b]] = pending_fp[chosen]
        counts[b] += 1
        keep = np.ones(len(pending_fp), dtype=bool)
        keep[chosen] = False
        pending_fp = pending_fp[keep]
        pending_i1 = pending_i1[keep]
        pending_i2 = pending_i2[keep]
    # rare path: both buckets full -> classic eviction random walk,
    # deterministic victim rotation (kick count picks the slot)
    for f, b1 in zip(pending_fp.tolist(), pending_i1.tolist()):
        cur_fp, cur_b = np.uint16(f), int(b1)
        placed = False
        for kick in range(MAX_KICKS):
            row = slots[cur_b]
            free = np.flatnonzero(row == 0)
            if len(free):
                slots[cur_b, free[0]] = cur_fp
                placed = True
                break
            victim = kick % BUCKET_SLOTS
            cur_fp, slots[cur_b, victim] = row[victim].copy(), cur_fp
            cur_b = int(_alt(np.asarray([cur_b]),
                             np.asarray([cur_fp], dtype=np.uint16),
                             n_buckets)[0])
        if not placed:
            raise RuntimeError(
                f"cuckoo filter past design load (n_buckets={n_buckets}); "
                "increase cuckoo_buckets_per_shard")
    return slots.tobytes()


def probe(filter_bytes: bytes, h1: np.ndarray, h2: np.ndarray,
          n_buckets: int) -> np.ndarray:
    """Boolean array: True = maybe-seen (exact re-check follows),
    False = definitely new. Fully vectorized — the per-round hot path."""
    slots = np.frombuffer(filter_bytes, dtype=np.uint16).reshape(
        n_buckets, BUCKET_SLOTS)
    fp = _fp(h2)
    i1 = _i1(h1, n_buckets)
    i2 = _alt(i1, fp, n_buckets)
    f = fp.reshape(-1, 1)
    return ((slots[i1] == f).any(axis=1)) | ((slots[i2] == f).any(axis=1))


def delete(filter_bytes: bytes, h1: np.ndarray, h2: np.ndarray,
           n_buckets: int) -> bytes:
    """Remove ONE fingerprint occurrence per key (the cuckoo superpower
    bloom lacks — seen-state eviction for recrawl/mirror maintenance).
    Deleting a never-inserted key may evict a colliding fingerprint —
    only delete keys known present (the engine's callers delete rows
    they just read from the exact seen table). Maintenance-grain loop,
    not the fetch hot path."""
    slots = np.frombuffer(filter_bytes, dtype=np.uint16).reshape(
        n_buckets, BUCKET_SLOTS).copy()
    fp = _fp(h2)
    i1 = _i1(h1, n_buckets)
    i2 = _alt(i1, fp, n_buckets)
    for f, b1, b2 in zip(fp.tolist(), i1.tolist(), i2.tolist()):
        for b in (b1, b2):
            hit = np.flatnonzero(slots[b] == f)
            if len(hit):
                slots[b, hit[0]] = 0
                break
    return slots.tobytes()
