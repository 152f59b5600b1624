"""Shared helpers: deterministic seeding and hash/column plumbing."""

from __future__ import annotations

import hashlib

import numpy as np


def stable_seed(*parts) -> int:
    """Deterministic 64-bit seed from any tuple of identifiers.

    Used for per-(sketch, shard, partition) PRNG seeds so task retries and
    replays are reproducible — the Spark analogue of the reference persisting
    per-key PRNG state (``/root/reference/src/t_cuckoofilter.zig:9-25``)."""
    h = hashlib.sha256("\x1f".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "little")


def shard_of(hashes_u64: np.ndarray, num_shards: int) -> np.ndarray:
    """Shard routing for sharded filters: high 16 bits of the item hash,
    mod num_shards. High bits are used because the cuckoo bucket index
    consumes the LOW bits (``hash & (nbuckets-1)``) — low-bit sharding would
    correlate shard and bucket and skew per-shard fill."""
    return ((hashes_u64 >> np.uint64(48)) % np.uint64(num_shards)).astype(np.int32)


def i64_to_u64(a: np.ndarray) -> np.ndarray:
    """Reinterpret Spark's signed xxhash64 longs as unsigned (bit-identical)."""
    return np.ascontiguousarray(a, dtype=np.int64).view(np.uint64)
