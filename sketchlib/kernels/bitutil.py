"""Vectorized bit helpers shared by the sketch kernels."""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 → 0), via 6-step binary
    reduction — no float round-off anywhere."""
    x = x.astype(np.uint64, copy=True)
    out = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = x >= (_U64(1) << _U64(shift))
        out[big] += shift
        x[big] >>= _U64(shift)
    out[x > 0] += 1
    return out


def mix_u64(x: np.ndarray, rounds: int = 1) -> np.ndarray:
    """splitmix64 finalizer — cheap independent re-hash of a u64 array
    (public constant-set from Steele et al.; used for double-hashing and
    per-row hash derivation)."""
    z = x.astype(np.uint64, copy=True)
    for _ in range(rounds):
        z = (z + _U64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z
