"""Unit tests for the counting table (ops/sorttable.py via KmerTable)."""

import numpy as np
import jax.numpy as jnp

from yak_tpu.table import KmerTable


def _rand_hashes(rng, n, dup_frac=0.5):
    base = rng.integers(0, 1 << 62, size=max(n // 2, 1), dtype=np.uint64)
    idx = rng.integers(0, len(base), size=n)
    return base[idx]


def test_insert_lookup_roundtrip():
    rng = np.random.default_rng(0)
    h = _rand_hashes(rng, 4096)
    t = KmerTable(k=31, cap_log2=13)
    t.insert_hashes(jnp.asarray(h), jnp.ones(len(h), bool))
    want = {}
    for x in h:
        want[int(x)] = want.get(int(x), 0) + 1
    got_h, got_c = t.items()
    got = {int(a): int(b) for a, b in zip(got_h, got_c)}
    assert got == want
    # lookup agrees
    q = np.concatenate([h[:100], rng.integers(0, 1 << 62, 50, dtype=np.uint64)])
    r = np.asarray(t.lookup_hashes(jnp.asarray(q), jnp.ones(len(q), bool)))
    for x, c in zip(q, r):
        assert int(c) == want.get(int(x), -1)


def test_multi_batch_and_growth():
    rng = np.random.default_rng(1)
    t = KmerTable(k=31, cap_log2=10)  # tiny: forces several growths
    want = {}
    for _ in range(6):
        h = _rand_hashes(rng, 2048)
        for x in h:
            want[int(x)] = min(want.get(int(x), 0) + 1, 1023)
        t.insert_hashes(jnp.asarray(h), jnp.ones(len(h), bool))
    got_h, got_c = t.items()
    got = {int(a): int(b) for a, b in zip(got_h, got_c)}
    assert got == want
    assert t.tot == len(want)


def test_saturation_at_1023():
    t = KmerTable(k=31, cap_log2=10)
    h = jnp.full(2000, 12345, jnp.uint64)
    t.insert_hashes(h, jnp.ones(2000, bool))
    _, c = t.items()
    assert list(c) == [1023]


def test_increment_only_mode():
    t = KmerTable(k=31, cap_log2=10)
    t.insert_hashes(jnp.asarray([1, 2, 3], dtype=jnp.uint64),
                    jnp.ones(3, bool))
    # create_new=False: key 4 must NOT be created (htab.c:71-75)
    t.insert_hashes(jnp.asarray([2, 4, 4], dtype=jnp.uint64),
                    jnp.ones(3, bool), create_new=False)
    got_h, got_c = t.items()
    got = {int(a): int(b) for a, b in zip(got_h, got_c)}
    assert got == {1: 1, 2: 2, 3: 1}


def test_clear_set_hist_shrink():
    rng = np.random.default_rng(2)
    t = KmerTable(k=31, cap_log2=12)
    h = _rand_hashes(rng, 3000)
    t.insert_hashes(jnp.asarray(h), jnp.ones(len(h), bool))
    hist = t.hist()
    _, c = t.items()
    want_hist = np.bincount(c, minlength=1024)
    assert np.array_equal(hist, want_hist)
    n2 = int((c >= 2).sum())
    t.shrink(2, 1023)
    assert t.tot == n2
    t.set_counts(7)
    _, c = t.items()
    assert set(c) == {7}
    t.clear_counts()
    _, c = t.items()
    assert set(c) == {0}


def test_invalid_lanes_ignored():
    t = KmerTable(k=31, cap_log2=10)
    h = jnp.asarray([5, 6, 7, 8], dtype=jnp.uint64)
    v = jnp.asarray([True, False, True, False])
    t.insert_hashes(h, v)
    got_h, _ = t.items()
    assert sorted(int(x) for x in got_h) == [5, 7]


def test_pmerge_overflow_replay_keeps_cap(monkeypatch):
    """Overflow replay under the pmerge engine must leave self.cap in
    sync with the grown table (round-1 regression: _check_last_step grew
    a local state but self.cap stayed stale, so the next materialize
    truncated the merged table and silently dropped keys).  Runs the
    Pallas merge-reduce kernel in interpret mode on CPU."""
    rng = np.random.default_rng(31)
    k = 21
    chunks = [rng.integers(0, 4, size=8192).astype(np.uint8)
              for _ in range(3)]

    t_ref = KmerTable(k, cap_log2=14, cap_hinted=True, flush_lanes=8192)
    for c in chunks:
        t_ref.insert_codes(c)
    href, cref = t_ref.items()

    monkeypatch.setenv("YAK_TPU_PMERGE_INTERPRET", "1")
    t = KmerTable(k, cap_log2=14, cap_hinted=True, flush_lanes=8192)
    for c in chunks:
        t.insert_codes(c)
    h, cnt = t.items()
    assert t.cap > (1 << 14)        # the replay really grew
    assert len(h) == len(href) > (1 << 14)
    np.testing.assert_array_equal(h, href)
    np.testing.assert_array_equal(cnt, cref)


def test_bloom_pmerge_overflow_replay(monkeypatch):
    """Overflow replay through the GATED bloom step's u64 twin
    (countstep._STEP_CFG tag "bloom" -> get_count_bloom_step): a
    cap-hinted undershoot during the -b pass 1 must grow and replay
    with identical results to the ungated-then-gated reference."""
    rng = np.random.default_rng(41)
    k = 21
    # every chunk inserted twice: the gate admits keys on their second
    # sighting, so the table still has to hold ~all distinct keys
    chunks = [c for c in (rng.integers(0, 4, size=8192).astype(np.uint8)
                          for _ in range(3)) for _ in range(2)]

    def build():
        t = KmerTable(k, cap_log2=14, cap_hinted=True, bf_shift=20,
                      flush_lanes=8192)
        assert t.bf is not None
        for c in chunks:
            t.insert_codes(c)
        t.flush()
        return t

    ref = build()                   # xla-mode gate (CPU default)
    href, cref = ref.items()
    assert ref.cap > (1 << 14)      # the replay really grew

    monkeypatch.setenv("YAK_TPU_PMERGE_INTERPRET", "1")
    t = build()                     # gated pmerge + bloom twin replay
    h, cnt = t.items()
    assert t.cap > (1 << 14)
    np.testing.assert_array_equal(h, href)
    np.testing.assert_array_equal(cnt, cref)


def test_psort_engine_parity_and_replay(monkeypatch):
    """The psort engine (Pallas bitonic batch sort + in-dispatch
    merge-path search + merge-reduce, table._run_step's 4-dispatch
    split) produces the identical table to the XLA engine, including
    an overflow replay through the u64 twin step.  Interpret mode on
    CPU."""
    rng = np.random.default_rng(77)
    k = 21
    chunks = [rng.integers(0, 4, size=8192).astype(np.uint8)
              for _ in range(3)]

    t_ref = KmerTable(k, cap_log2=14, cap_hinted=True, flush_lanes=8192)
    for c in chunks:
        t_ref.insert_codes(c)
    href, cref = t_ref.items()

    monkeypatch.setenv("YAK_TPU_PSORT_INTERPRET", "1")
    t = KmerTable(k, cap_log2=14, cap_hinted=True, flush_lanes=8192)
    for c in chunks:
        t.insert_codes(c)
    h, cnt = t.items()
    assert t.cap > (1 << 14)        # the replay really grew
    np.testing.assert_array_equal(h, href)
    np.testing.assert_array_equal(cnt, cref)
