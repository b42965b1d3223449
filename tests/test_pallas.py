"""Pallas compaction kernel vs the NumPy oracle (interpret mode on CPU;
the real-TPU path is exercised by bench.py and the integration flag)."""

import numpy as np
import pytest

from yak_tpu.ops import pallas_compact as pc


def roundtrip(n, density, seed):
    rng = np.random.default_rng(seed)
    keep = rng.random(n) < density
    khi = rng.integers(0, 1 << 31, n).astype(np.uint32)
    khi = np.where(keep, khi, khi | np.uint32(1 << 31))
    klo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    v = rng.integers(-5, 1024, n).astype(np.int32)
    ohi, olo, ov = pc.compact_u32(khi, klo, v, interpret=True)
    whi, wlo, wv, m = pc.compact_reference(khi, klo, v)
    np.testing.assert_array_equal(np.asarray(ohi)[:m], whi[:m])
    np.testing.assert_array_equal(np.asarray(olo)[:m], wlo[:m])
    np.testing.assert_array_equal(np.asarray(ov)[:m], wv[:m])


@pytest.mark.parametrize("density", [0.0, 0.1, 0.5, 0.9, 1.0])
def test_one_tile(density):
    roundtrip(pc.T, density, 1)


def test_multi_tile_cursor_carry():
    roundtrip(4 * pc.T, 0.37, 2)


def test_unaligned_length_padding():
    roundtrip(3 * pc.T - 1234, 0.6, 3)


def test_order_preserved():
    n = 2 * pc.T
    rng = np.random.default_rng(4)
    keep = rng.random(n) < 0.3
    khi = np.arange(n, dtype=np.uint32)  # strictly increasing = order probe
    khi = np.where(keep, khi, khi | np.uint32(1 << 31))
    klo = np.zeros(n, np.uint32)
    v = np.arange(n, dtype=np.int32)
    ohi, olo, ov = pc.compact_u32(khi, klo, v, interpret=True)
    m = int(keep.sum())
    got = np.asarray(ohi)[:m]
    assert (np.diff(got.astype(np.int64)) > 0).all()
    np.testing.assert_array_equal(np.asarray(ov)[:m], np.arange(n)[keep])
