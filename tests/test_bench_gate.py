"""The scaling-rep acceptance gate is pure arithmetic — pin its behavior
so the self-evidencing BENCH artifact can be trusted without rereading
bench.py each round. (No Spark session needed.)"""

from __future__ import annotations

import bench


def rep(s8, m8, s32, m32):
    return bench.scaling_rep(s8, m8, s32, m32)


def test_rep_record_arithmetic():
    r = rep(1000.0, 2000.0, 4000.0, 4000.0)
    assert r["spark_eff"] == 1.0      # 4000 / (4*1000)
    assert r["mp_eff"] == 0.5         # 4000 / (4*2000)
    assert r["normalized_eff"] == 2.0


def test_accepts_sane_windows():
    # spark and control both ~0.5 weak-scaling efficiency → normalized 1.0
    assert bench.scaling_rep_ok(rep(1000, 1500, 2000, 3000))


def test_rejects_collapsed_control():
    # mp_eff = 0.15 < floor: normalizing by it would inflate the ratio
    assert not bench.scaling_rep_ok(rep(1000, 5000, 2000, 3000))


def test_rejects_superlinear_control():
    # mp_eff = 1.05 > ceiling: physically impossible weak scaling
    assert not bench.scaling_rep_ok(rep(1000, 1000, 2000, 4200))


def test_rejects_out_of_band_normalized_both_sides():
    # control fine (0.5) but spark "scaled" 1.6x better → window mismatch
    assert not bench.scaling_rep_ok(rep(1000, 1500, 3200, 3000))
    # and 2.5x worse → same
    assert not bench.scaling_rep_ok(rep(1000, 1500, 800, 3000))


def test_band_edges_inclusive():
    # normalized exactly 1.5 with a sane control is accepted
    r = rep(1000, 2000, 3000, 4000)  # spark_eff .75, mp_eff .5, norm 1.5
    assert bench.scaling_rep_ok(r)
    # normalized exactly 0.5 with a sane control is accepted
    r = rep(1000, 1500, 1000, 3000)  # spark_eff .25, mp_eff .5, norm 0.5
    assert bench.scaling_rep_ok(r)
    # control exactly at the floor is accepted (normalized in band)
    assert bench.scaling_rep_ok(rep(1000, 2000, 1200, 2000))   # mp .25, norm 1.2
