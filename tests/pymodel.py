"""Slow pure-Python cuckoo-filter model for lockstep differential testing.

Mirrors the reference's own methodology (``/root/reference/RELEASENOTES:104-117``:
a slow obviously-correct implementation run in lockstep with the fast one,
comparing full state after every operation). No numpy anywhere — plain lists
and ints — so it shares no vectorization code with the kernel under test.
Scalar semantics follow ``/root/reference/src/lib/zig-cuckoofilter.zig`` 1:1.
"""

from __future__ import annotations

from sketchlib.kernels.prng import Xoroshiro128Plus

FNV_OFFSET = 14695981039346656037
FNV_PRIME = 1099511628211
MASK64 = (1 << 64) - 1
BUCK_SIZE = {1: 4, 2: 4, 4: 2}


class PyTooFull(Exception):
    pass


class PyBroken(Exception):
    pass


class PyCuckoo:
    def __init__(self, size: int, fpsize: int, seed: int = 42):
        self.fpsize = fpsize
        self.bucksize = BUCK_SIZE[fpsize]
        nbuckets = size // fpsize // self.bucksize
        self.buckets = [[0] * self.bucksize for _ in range(nbuckets)]
        self.homeless_fp = 0
        self.homeless_bucket_idx = 0
        self.fpcount = 0
        self.broken = False
        self.prng = Xoroshiro128Plus(seed=seed)

    # -- helpers ----------------------------------------------------------
    def _fp(self, fp: int) -> int:
        fp &= (1 << (8 * self.fpsize)) - 1
        return 1 if fp == 0 else fp

    def _alt(self, idx: int, fp: int) -> int:
        res = FNV_OFFSET
        for i in range(self.fpsize):
            res = ((res ^ ((fp >> (8 * i)) & 0xFF)) * FNV_PRIME) & MASK64
        return (idx ^ res) & (len(self.buckets) - 1)

    def state(self):
        return (
            tuple(tuple(b) for b in self.buckets),
            self.homeless_fp,
            self.homeless_bucket_idx if self.homeless_fp else None,
            self.fpcount,
            self.broken,
            self.prng.state,
        )

    # -- ops (reference lib:106-203) --------------------------------------
    def add(self, hash_: int, fp: int) -> None:
        if self.broken:
            raise PyBroken()
        fp = self._fp(fp)
        idx = hash_ & (len(self.buckets) - 1)
        b = self.buckets[idx]
        for i in range(self.bucksize):
            if b[i] == 0:
                b[i] = fp
                self.fpcount += 1
                return
        alt = self._alt(idx, fp)
        if self.homeless_fp != 0:
            b = self.buckets[alt]
            for i in range(self.bucksize):
                if b[i] == 0:
                    b[i] = fp
                    self.fpcount += 1
                    return
            raise PyTooFull()
        self.homeless_bucket_idx = alt
        self.homeless_fp = fp
        self.fpcount += 1
        for _ in range(500):
            self.homeless_bucket_idx = self._alt(self.homeless_bucket_idx, self.homeless_fp)
            b = self.buckets[self.homeless_bucket_idx]
            for i in range(self.bucksize):
                if b[i] == 0:
                    b[i] = self.homeless_fp
                    self.homeless_fp = 0
                    return
            slot = self.prng.next_below(self.bucksize)
            b[slot], self.homeless_fp = self.homeless_fp, b[slot]

    def contains(self, hash_: int, fp: int) -> bool:
        fp = self._fp(fp)
        idx = hash_ & (len(self.buckets) - 1)
        if fp in self.buckets[idx]:
            return True
        alt = self._alt(idx, fp)
        if fp in self.buckets[alt]:
            return True
        if self.homeless_fp == fp and self.homeless_bucket_idx in (idx, alt):
            return True
        if self.broken:
            raise PyBroken()
        return False

    def remove(self, hash_: int, fp: int) -> None:
        if self.broken:
            raise PyBroken()
        fp = self._fp(fp)
        idx = hash_ & (len(self.buckets) - 1)
        for cand in (idx, self._alt(idx, fp)):
            b = self.buckets[cand]
            for i in range(self.bucksize):
                if b[i] == fp:
                    b[i] = 0
                    self.fpcount -= 1
                    return
        alt = self._alt(idx, fp)
        if self.homeless_fp == fp and self.homeless_bucket_idx in (idx, alt):
            self.homeless_fp = 0
            self.fpcount -= 1
            return
        self.broken = True
        raise PyBroken()

    def count(self) -> int:
        if self.broken:
            raise PyBroken()
        return self.fpcount

    def fix_toofull(self) -> None:
        if self.homeless_fp == 0:
            return
        fp = self.homeless_fp
        self.homeless_fp = 0
        self.fpcount -= 1  # add() re-increments (kernel's exact-count semantics)
        self.add(self.homeless_bucket_idx, fp)
        if self.homeless_fp != 0:
            raise PyTooFull()
