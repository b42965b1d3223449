"""Differential tests for the hierarchical bitonic sort engine
(ops/pallas_sort) against numpy, in interpret mode.

The workload-level interpret tests only ever sort batches smaller than
the 2^17-lane VMEM window, so without these tests the CROSS-WINDOW
exchange kernel (_exchange_kernel, the passes a real 2^23-lane TPU
batch runs 21 times) would have zero coverage: `window=1024` forces
multi-window sorts at test-sized inputs, exercising every pass type
(grouped local levels, exchange stages, windowed tails).
"""

import numpy as np
import pytest

from yak_tpu.ops import pallas_sort


def _u64(hi, lo):
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)


@pytest.mark.parametrize("B,window", [(1024, 1024), (4096, 1024),
                                      (16384, 2048)])
@pytest.mark.parametrize("neg", [False, True])
def test_sort_planes_u64_vs_numpy(B, window, neg):
    """Two-plane (hi/lo u64) sort with a payload plane; windows smaller
    than B force the cross-window exchange passes."""
    rng = np.random.default_rng(B + window + neg)
    # distinct keys so the payload permutation is fully determined
    keys = rng.choice(np.uint64(1) << np.uint64(50), size=B,
                      replace=False).astype(np.uint64)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pay = rng.integers(0, 1 << 30, B).astype(np.int32)

    shi, slo, spay = pallas_sort.sort_planes(
        hi, lo, pay, neg_keys=neg, window=window, interpret=True)
    shi, slo = np.asarray(shi), np.asarray(slo)
    spay = np.asarray(spay)

    order = np.argsort(keys, kind="stable")
    want = keys[order]
    # neg_keys complements the key planes in place on the final write
    # (ascending keys == descending complements, the merge kernel's E
    # contract); payload planes are never complemented or moved.
    got = _u64(~shi if neg else shi, ~slo if neg else slo)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(spay, pay[order])


@pytest.mark.parametrize("B,window", [(2048, 1024), (8192, 1024)])
def test_sort_planes32_vs_numpy(B, window):
    """Single-u32-key variant (key_planes=1) with two payload planes
    across window boundaries."""
    rng = np.random.default_rng(B)
    key = rng.permutation(B).astype(np.uint32)  # distinct
    p1 = rng.integers(-(1 << 30), 1 << 30, B).astype(np.int32)
    p2 = rng.integers(0, 1 << 31, B).astype(np.uint32)

    sk, s1, s2 = pallas_sort.sort_planes32(
        key, p1, p2, window=window, interpret=True)
    order = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), key[order])
    np.testing.assert_array_equal(np.asarray(s1), p1[order])
    np.testing.assert_array_equal(np.asarray(s2), p2[order])


def test_sort_planes_duplicate_keys_grouped():
    """Duplicate keys (the count path's reality): every equal-key group
    must land contiguous with the right multiplicity, payloads a
    permutation within their group."""
    rng = np.random.default_rng(9)
    B = 4096
    keys = rng.integers(0, 64, B).astype(np.uint64) * np.uint64(7)
    hi = (keys >> np.uint64(32)).astype(np.uint32)
    lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    pay = np.arange(B, dtype=np.int32)

    shi, slo, spay = pallas_sort.sort_planes(
        hi, lo, pay, window=1024, interpret=True)
    got = _u64(np.asarray(shi), np.asarray(slo))
    np.testing.assert_array_equal(got, np.sort(keys))
    # payload lanes of each key group match the input's lanes
    spay = np.asarray(spay)
    for kv in np.unique(keys):
        np.testing.assert_array_equal(
            np.sort(spay[got == kv]), np.sort(pay[keys == kv]))


def test_mesh_sort_matches_flat():
    """sort_planes_mesh: each device row sorted independently, equal to
    the flat sort of that row (virtual CPU mesh, interpret mode)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("not enough virtual devices")
    from yak_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    rng = np.random.default_rng(11)
    D, B = 4, 2048
    hi = rng.integers(0, 1 << 31, (D, B)).astype(np.uint32)
    lo = rng.integers(0, 1 << 31, (D, B)).astype(np.uint32)
    shi, slo = pallas_sort.sort_planes_mesh(
        mesh, hi, lo, window=1024, interpret=True)
    got = _u64(np.asarray(shi), np.asarray(slo))
    want = np.sort(_u64(hi, lo), axis=1)
    np.testing.assert_array_equal(got, want)


def test_psort_smoke_gate(monkeypatch):
    """The one-time hardware self-test (countstep._psort_smoke_ok)
    poisons the psort gate when the sort kernels raise OR return wrong
    data, and passes when they behave — so a Mosaic failure on real TPU
    degrades to the XLA engine instead of crashing every workload."""
    from yak_tpu.ops import countstep

    def fresh():
        d = {"ok": None, "class": None, "err": None}
        monkeypatch.setattr(countstep, "_PSORT_SMOKE", d)
        return d

    st = fresh()

    def boom(*a, **kw):
        raise RuntimeError("mosaic rejected the kernel")

    monkeypatch.setattr(pallas_sort, "sort_planes", boom)
    assert countstep._psort_smoke_ok() is False
    assert countstep._psort_smoke_ok() is False  # sticky, no re-dispatch
    assert st["class"] == "backend"

    # wrong DATA (silent mis-lowering) must poison too, as class "data"
    st = fresh()
    monkeypatch.setattr(pallas_sort, "sort_planes",
                        lambda *ps, **kw: ps)  # identity = unsorted
    assert countstep._psort_smoke_ok() is False
    assert st["class"] == "data"

    # a plain-Python bug (the r3 NameError shipped at HEAD) must be
    # classified as OURS, not a backend limit
    st = fresh()

    def py_bug(*a, **kw):
        raise NameError("name '_dyn_enabled' is not defined")

    monkeypatch.setattr(pallas_sort, "sort_planes", py_bug)
    assert countstep._psort_smoke_ok() is False
    assert st["class"] == "python"

    # healthy kernels (interpret mode stands in for hardware) pass
    monkeypatch.undo()
    st = fresh()
    orig = pallas_sort.sort_planes
    monkeypatch.setattr(
        pallas_sort, "sort_planes",
        lambda *ps, **kw: orig(*ps, **{**kw, "interpret": True}))
    assert countstep._psort_smoke_ok() is True
    assert st["class"] is None


def test_smoke_gate_sees_no_python_error():
    """Assert the smoke test's own sort path raises no PYTHON-class
    exception (r3 VERDICT weak #6: a NameError in the pass-chain
    builder shipped at HEAD and the gate silently ate it).  Runs the
    exact smoke workload through the full _sort_fn plumbing in
    interpret mode; a backend-class failure would be acceptable on an
    exotic host, a python-class one never is."""
    from yak_tpu.ops import countstep

    rng = np.random.default_rng(0xDA7A)
    B = 1 << 12
    hi = rng.integers(0, 1 << 32, B, dtype=np.uint64)
    lo = rng.integers(0, 1 << 32, B, dtype=np.uint64)
    val = rng.integers(0, 1 << 32, B, dtype=np.uint64)
    try:
        pallas_sort.sort_planes(
            hi.astype(np.uint32), lo.astype(np.uint32),
            val.astype(np.uint32), window=1024, interpret=True)
    except Exception as e:  # noqa: BLE001 — classifying, not hiding
        assert countstep._classify_smoke_failure(e) != "python", e
        raise
