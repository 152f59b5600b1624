"""Deterministic PRNG for eviction-victim choice.

The reference persists Xoroshiro128+ state per filter so every mutation is
replayable (``/root/reference/src/redis-cuckoofilter.zig:8-11`` seeds it with
42 at compile time; state is swapped in/out around each mutating command at
``:256-259`` and serialized at ``/root/reference/src/t_cuckoofilter.zig:119-120``).

We implement the public xoroshiro128+ algorithm (Blackman & Vigna 2016,
rotation constants 55/14/36) with splitmix64 seeding. Determinism — not
byte-parity with Zig's stdlib integer-narrowing — is the contract
(SURVEY.md §2.2 #23): given the same seed and operation sequence our filters
are byte-identical across runs, task retries, and merge orders.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1


def _rotl(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK64


def splitmix64(seed: int):
    """Yields the splitmix64 stream — the standard seeder for xoroshiro."""
    z = seed & _MASK64
    while True:
        z = (z + 0x9E3779B97F4A7C15) & _MASK64
        r = z
        r = ((r ^ (r >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
        r = ((r ^ (r >> 27)) * 0x94D049BB133111EB) & _MASK64
        yield r ^ (r >> 31)


class Xoroshiro128Plus:
    """xoroshiro128+ with save/restorable state (the reference's generator)."""

    __slots__ = ("s0", "s1")

    def __init__(self, seed: int = 42, state: tuple[int, int] | None = None):
        if state is not None:
            self.s0, self.s1 = state[0] & _MASK64, state[1] & _MASK64
            if self.s0 == 0 and self.s1 == 0:
                self.s0 = 1  # all-zero state is invalid for xoroshiro
        else:
            self.seed(seed)

    def seed(self, seed: int) -> None:
        g = splitmix64(seed)
        self.s0 = next(g)
        self.s1 = next(g)

    @property
    def state(self) -> tuple[int, int]:
        return (self.s0, self.s1)

    def next_u64(self) -> int:
        s0, s1 = self.s0, self.s1
        result = (s0 + s1) & _MASK64
        s1 ^= s0
        self.s0 = _rotl(s0, 55) ^ s1 ^ ((s1 << 14) & _MASK64)
        self.s1 = _rotl(s1, 36)
        return result

    def next_below(self, n: int) -> int:
        """Victim-slot choice: low bits of the next draw; n is a power of 2.

        Mirrors the reference drawing ``log2(buckSize)`` random bits per
        eviction (``/root/reference/src/lib/zig-cuckoofilter.zig:251-257``).
        """
        return self.next_u64() & (n - 1)
