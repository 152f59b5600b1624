"""sketchlib — a from-scratch PySpark-native distributed sketch library.

Centered on hashing-function-agnostic Cuckoo filters (FP8/FP16/FP32 widths
with partial-key cuckoo kicking; add/check/remove/count with exact-deletion
correctness and a no-false-negative guarantee), plus Bloom, HyperLogLog,
count-min, KLL and t-digest sketches — all mergeable aggregators built over
plain DataFrames with Arrow-vectorized numpy kernels (no per-row Python).

Reference semantics: kristoff-it/redis-cuckoofilter (see SURVEY.md). This is
a brand-new Spark-first design, not a port.
"""

from sketchlib.kernels.cuckoo import (
    BrokenError,
    CuckooFilter,
    TooFullError,
    capacity,
    size_for,
    size_for_exactly,
    size2str,
    str2size,
)

__all__ = [
    "BrokenError",
    "CuckooFilter",
    "TooFullError",
    "capacity",
    "size_for",
    "size_for_exactly",
    "size2str",
    "str2size",
]

__version__ = "0.1.0"
