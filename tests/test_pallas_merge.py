"""Pallas merge-reduce kernel vs the XLA merge_batch ground truth
(interpret mode on CPU; real-TPU parity via bench/.tpu_parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from yak_tpu.ops import sorttable as st
from yak_tpu.ops.countstep import _pmerge_prep_impl, finalize_pmerge
from yak_tpu.ops.pallas_merge import merge_reduce, merge_reduce_presorted


def run_both(tpairs, batch, adds, valid, cap, create=True):
    """Returns ((keys, cnt, size, n_new, ovf) kernel, same XLA)."""
    tk = np.zeros(cap, np.uint64)
    tc = np.full(cap, -1, np.int32)
    hs, cs = tpairs
    order = np.argsort(hs)
    tk[:len(hs)] = hs[order]
    tc[:len(hs)] = cs[order]
    args = (jnp.asarray(tk), jnp.asarray(tc), jnp.int32(len(hs)),
            jnp.asarray(batch), jnp.asarray(adds), jnp.asarray(valid))

    prep = _pmerge_prep_impl(*args)
    out = merge_reduce(*prep, Na=cap, Nb=len(batch), create=create,
                       interpret=True)
    got = finalize_pmerge(*out, cap=cap)

    want = st.merge_batch(*args, mode=st.ADD, create=create, packable=True)
    return got, want


def check(got, want):
    gk, gc, gs, gn, go = [np.asarray(x) for x in got]
    wk, wc, ws, wn, wo = [np.asarray(x) for x in want]
    assert int(gs) == int(ws), (int(gs), int(ws))
    assert bool(go) == bool(wo)
    assert int(gn) == int(wn), (int(gn), int(wn))
    n = int(ws)
    np.testing.assert_array_equal(gk[:n], wk[:n])
    np.testing.assert_array_equal(gc[:n], wc[:n])


def make_case(rng, cap, n_table, n_batch, key_space, max_cnt=900):
    hs = rng.choice(key_space, size=n_table, replace=False).astype(np.uint64)
    cs = rng.integers(0, max_cnt, n_table).astype(np.int32)
    batch = rng.choice(key_space, size=n_batch, replace=True).astype(
        np.uint64)
    adds = np.ones(n_batch, np.int32)
    valid = rng.random(n_batch) < 0.97
    return (hs, cs), batch, adds, valid


def test_basic_multi_tile():
    rng = np.random.default_rng(0)
    space = rng.integers(0, 1 << 62, 60000, dtype=np.uint64)
    case = make_case(rng, 1 << 14, 9000, 20000, space)
    check(*run_both(*case, cap=1 << 14))


def test_heavy_duplicates_and_saturation():
    """One key repeated across 3 tiles exercises the run carry and the
    1023 saturation; a table hit on that key exercises carried has_table."""
    rng = np.random.default_rng(1)
    hot = np.uint64(12345)
    batch = np.full(20000, hot, np.uint64)
    batch[17000:] = rng.integers(0, 1 << 62, 3000, dtype=np.uint64)
    adds = np.ones(20000, np.int32)
    valid = np.ones(20000, bool)
    tpairs = (np.array([hot, 77], np.uint64), np.array([5, 3], np.int32))
    got, want = run_both(tpairs, batch, adds, valid, cap=1 << 14)
    check(got, want)


def test_create_false_increment_only():
    rng = np.random.default_rng(2)
    space = rng.integers(0, 1 << 62, 30000, dtype=np.uint64)
    case = make_case(rng, 1 << 14, 7000, 12000, space)
    check(*run_both(*case, cap=1 << 14, create=False))


def test_empty_table_and_overflow():
    rng = np.random.default_rng(3)
    space = rng.integers(0, 1 << 62, 40000, dtype=np.uint64)
    tpairs = (np.zeros(0, np.uint64), np.zeros(0, np.int32))
    batch = rng.choice(space, size=30000).astype(np.uint64)
    adds = np.ones(30000, np.int32)
    valid = np.ones(30000, bool)
    # cap 2^14 = 16384 < distinct(batch) -> overflow flagged identically
    got, want = run_both(tpairs, batch, adds, valid, cap=1 << 14)
    gs, ws = np.asarray(got[4]), np.asarray(want[4])
    assert bool(gs) == bool(ws)


@pytest.mark.parametrize("n_hot", [8191, 8192, 8193, 16384])
def test_run_at_tile_boundary(n_hot):
    """Runs closing exactly at (or around) tile edges exercise the carry
    open/inject paths deterministically."""
    hot = np.uint64(999)
    later = np.uint64(1 << 40)
    batch = np.concatenate([np.full(n_hot, hot, np.uint64),
                            np.full(300, later, np.uint64)])
    adds = np.ones(len(batch), np.int32)
    valid = np.ones(len(batch), bool)
    tpairs = (np.zeros(0, np.uint64), np.zeros(0, np.int32))
    check(*run_both(tpairs, batch, adds, valid, cap=1 << 14))


def test_create_false_carried_batch_only_run_dropped():
    hot = np.uint64(4242)   # spans tiles, absent from the table
    batch = np.full(12000, hot, np.uint64)
    adds = np.ones(12000, np.int32)
    valid = np.ones(12000, bool)
    tpairs = (np.array([77], np.uint64), np.array([9], np.int32))
    check(*run_both(tpairs, batch, adds, valid, cap=1 << 14,
                    create=False))


def test_bloom_gated_pmerge_matches_xla_step():
    """Bloom-gated batch (dedup'd keys with multiplicities as add
    weights) through the merge-reduce kernel == the XLA bloom step."""
    import jax.numpy as jnp
    from yak_tpu.ops.bloom import make_bloom, bloom_insert
    from yak_tpu.ops import sorttable as stm

    rng = np.random.default_rng(7)
    space = rng.integers(0, 1 << 62, 4000, dtype=np.uint64)
    batch = rng.choice(space, size=12000).astype(np.uint64)
    valid = rng.random(12000) < 0.95
    cap = 1 << 14
    tk, tc, sz = stm.make_table(cap)

    pre, bf_shift, bf_n = 10, 20, 4
    h = jnp.asarray(batch)
    v = jnp.asarray(valid)
    hs, starts, mult = stm.dedup(h, v, packable=True)
    bf, n_before = bloom_insert(make_bloom(bf_shift), hs, starts, pre=pre,
                                n_shift=bf_shift, n_hashes=bf_n)
    add = jnp.where(n_before == bf_n, mult, mult - 1)
    vv = starts & (add > 0)

    prep = _pmerge_prep_impl(tk, tc, sz, hs, add, vv)
    out = merge_reduce(*prep, Na=cap, Nb=12000, create=True,
                       interpret=True)
    got = finalize_pmerge(*out, cap=cap)
    want = st.merge_batch(tk, tc, sz, hs, add, vv, mode=st.ADD,
                          create=True, packable=True)
    check(got, want)


def test_bloom_gate_post_psort_matches_xla_step():
    """The full Bloom-gated psort pipeline (sort -> gate post -> weighted
    presorted merge) == the XLA bloom step (dedup -> bloom -> masked
    merge), including bit-identical filter state."""
    import jax.numpy as jnp
    from yak_tpu.ops.bloom import make_bloom, bloom_insert
    from yak_tpu.ops import pallas_sort
    from yak_tpu.ops import sorttable as stm
    from yak_tpu.ops.countstep import _xs_planes, get_bloom_gate_post

    rng = np.random.default_rng(17)
    space = rng.integers(0, 1 << 62, 4000, dtype=np.uint64)
    batch = rng.choice(space, size=12000).astype(np.uint64)
    valid = rng.random(12000) < 0.95
    cap = 1 << 14
    tk, tc, sz = stm.make_table(cap)
    pre, bf_shift, bf_n = 10, 20, 4

    h = jnp.asarray(batch)
    v = jnp.asarray(valid)

    # psort path
    xhi, xlo = _xs_planes(h, v)
    Ehi, Elo = pallas_sort.sort_planes(xhi, xlo, neg_keys=True,
                                       interpret=True)
    bw, bf_ps = get_bloom_gate_post(pre, bf_shift, bf_n)(
        Ehi, Elo, make_bloom(bf_shift))
    shifted = tk << jnp.uint64(1)
    thi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    size_s = jnp.minimum(sz, cap).reshape(1).astype(jnp.int32)
    out = merge_reduce_presorted(size_s, thi, tlo, tc, Ehi, Elo, bw=bw,
                                 Na=cap, Nb=12000, create=True,
                                 interpret=True)
    got = finalize_pmerge(*out, cap=cap)

    # XLA reference path
    hs, starts, mult = stm.dedup(h, v, packable=True)
    bf_x, n_before = bloom_insert(make_bloom(bf_shift), hs, starts,
                                  pre=pre, n_shift=bf_shift,
                                  n_hashes=bf_n)
    add = jnp.where(n_before == bf_n, mult, mult - 1)
    want = st.merge_batch(tk, tc, sz, hs, add, starts & (add > 0),
                          mode=st.ADD, create=True, packable=True)
    check(got, want)
    np.testing.assert_array_equal(np.asarray(bf_ps), np.asarray(bf_x))


def test_bloom_gate_sentinel_matches_plain_post():
    """The sentinel-merge gate post (run_bloom_gate_post: sentinel
    position sort + streaming-compactor extraction, no searchsorted)
    produces bit-identical (bw, bf') to the one-jit searchsorted gate
    post on the same sorted stream."""
    import jax.numpy as jnp
    from yak_tpu.ops import pallas_sort
    from yak_tpu.ops.bloom import make_bloom
    from yak_tpu.ops.countstep import (_xs_planes, get_bloom_gate_post,
                                       run_bloom_gate_post)

    rng = np.random.default_rng(23)
    space = rng.integers(0, 1 << 62, 4000, dtype=np.uint64)
    batch = rng.choice(space, size=12000).astype(np.uint64)
    valid = rng.random(12000) < 0.95
    pre, bf_shift, bf_n = 10, 20, 4

    h = jnp.asarray(batch)
    v = jnp.asarray(valid)
    xhi, xlo = _xs_planes(h, v)
    Ehi, Elo = pallas_sort.sort_planes(xhi, xlo, neg_keys=True,
                                       interpret=True)
    bw_s, bf_s = run_bloom_gate_post(
        Ehi, Elo, make_bloom(bf_shift), pre, bf_shift, bf_n,
        interpret=True)
    bw_p, bf_p = get_bloom_gate_post(pre, bf_shift, bf_n)(
        Ehi, Elo, make_bloom(bf_shift))
    np.testing.assert_array_equal(np.asarray(bw_s), np.asarray(bw_p))
    np.testing.assert_array_equal(np.asarray(bf_s), np.asarray(bf_p))


def _wide_psort_fold(tk, tc, sz, h, v, cap, B, bloom=None,
                     create=True):
    """Drive the full wide (k>=32) psort pipeline in interpret mode."""
    from yak_tpu.ops import pallas_sort
    from yak_tpu.ops.countstep import (_xs_planes, get_bloom_gate_post)

    xhi, xlo = _xs_planes(h, v, wide=True)
    Ehi, Elo = pallas_sort.sort_planes(xhi, xlo, neg_keys=True,
                                       interpret=True)
    thi = (tk >> jnp.uint64(32)).astype(jnp.uint32)
    tlo = (tk & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    size_s = jnp.minimum(sz, cap).reshape(1).astype(jnp.int32)
    bw = bf2 = None
    if bloom is not None:
        bf, pre, bf_shift, bf_n = bloom
        bw, bf2 = get_bloom_gate_post(pre, bf_shift, bf_n, wide=True)(
            Ehi, Elo, bf)
    out = merge_reduce_presorted(size_s, thi, tlo, tc, Ehi, Elo, bw=bw,
                                 Na=cap, Nb=B, create=create,
                                 interpret=True, wide=True)
    got = finalize_pmerge(*out, cap=cap, wide=True)
    return got, bf2


def test_wide_merge_matches_xla_step():
    """Wide (raw 64-bit key) psort fold == the multi-operand XLA merge:
    full-width hashes incl. >= 2^63 (which the packed kernel's
    key-space realness test would misjudge), duplicates across tiles,
    invalid lanes, and a non-empty table also holding >= 2^63 keys."""
    from yak_tpu.ops import sorttable as stm

    rng = np.random.default_rng(23)
    space = rng.integers(0, 1 << 64, 4000, dtype=np.uint64)
    space = np.where(space == np.uint64(0xFFFFFFFFFFFFFFFF),
                     space - np.uint64(1), space)
    batch = rng.choice(space, size=12000).astype(np.uint64)
    valid = rng.random(12000) < 0.95
    cap = 1 << 14
    tk, tc, sz = stm.make_table(cap)
    # seed the table with half the space (sorted unique)
    seed = np.unique(rng.choice(space, size=2000)).astype(np.uint64)
    tk = tk.at[:len(seed)].set(jnp.asarray(seed))
    tc = tc.at[:len(seed)].set(7)
    sz = jnp.int32(len(seed))

    h, v = jnp.asarray(batch), jnp.asarray(valid)
    got, _ = _wide_psort_fold(tk, tc, sz, h, v, cap, 12000)
    add = jnp.ones(12000, jnp.int32)
    want = st.merge_batch(tk, tc, sz, h, add, v, mode=st.ADD,
                          create=True, packable=False)
    check(got, want)


def test_wide_merge_create_false_and_clamp():
    """create=False drops batch-only wide runs; a valid hash of
    0xFF..FF is clamped to 0xFF..FE (documented 2^-64 inexactness that
    keeps exact-INF reserved for pads)."""
    from yak_tpu.ops import sorttable as stm

    cap = 1 << 14
    tk, tc, sz = stm.make_table(cap)
    present = np.uint64(1 << 63) | np.uint64(12345)
    tk = tk.at[0].set(present)
    tc = tc.at[0].set(3)
    sz = jnp.int32(1)
    inf = np.uint64(0xFFFFFFFFFFFFFFFF)
    batch = np.array([present] * 5 + [42] * 4 + [inf] * 3, np.uint64)
    batch = np.concatenate([batch,
                            np.zeros(16384 - len(batch), np.uint64)])
    valid = np.zeros(16384, bool)
    valid[:12] = True

    got, _ = _wide_psort_fold(tk, tc, sz, jnp.asarray(batch),
                              jnp.asarray(valid), cap, 16384,
                              create=False)
    keys, cnt, size = got[0], got[1], int(got[2])
    assert size == 1
    assert int(keys[0]) == int(present) and int(cnt[0]) == 8

    got2, _ = _wide_psort_fold(tk, tc, sz, jnp.asarray(batch),
                               jnp.asarray(valid), cap, 16384,
                               create=True)
    k2 = np.asarray(got2[0])[:int(got2[2])]
    c2 = np.asarray(got2[1])[:int(got2[2])]
    d = dict(zip(k2.tolist(), c2.tolist()))
    # the three 0xFF..FF instances landed on the clamped key 0xFF..FE
    assert d == {42: 4, int(present): 8, int(inf) - 1: 3}, d


def test_wide_bloom_gate_matches_xla_step():
    """Wide + Bloom-gated create == the XLA dedup/bloom/merge chain on
    full-width hashes, with bit-identical filter state."""
    from yak_tpu.ops.bloom import make_bloom, bloom_insert
    from yak_tpu.ops import sorttable as stm

    rng = np.random.default_rng(29)
    space = rng.integers(0, 1 << 64, 3000, dtype=np.uint64)
    space = np.where(space == np.uint64(0xFFFFFFFFFFFFFFFF),
                     space - np.uint64(1), space)
    batch = rng.choice(space, size=12000).astype(np.uint64)
    valid = rng.random(12000) < 0.95
    cap = 1 << 14
    tk, tc, sz = stm.make_table(cap)
    pre, bf_shift, bf_n = 10, 20, 4

    h, v = jnp.asarray(batch), jnp.asarray(valid)
    got, bf_ps = _wide_psort_fold(
        tk, tc, sz, h, v, cap, 12000,
        bloom=(make_bloom(bf_shift), pre, bf_shift, bf_n))

    hs, starts, mult = stm.dedup(h, v, packable=False)
    bf_x, n_before = bloom_insert(make_bloom(bf_shift), hs, starts,
                                  pre=pre, n_shift=bf_shift,
                                  n_hashes=bf_n)
    add = jnp.where(n_before == bf_n, mult, mult - 1)
    want = st.merge_batch(tk, tc, sz, hs, add, starts & (add > 0),
                          mode=st.ADD, create=True, packable=False)
    check(got, want)
    np.testing.assert_array_equal(np.asarray(bf_ps), np.asarray(bf_x))


def run_lookup(tpairs, batch, valid, cap):
    from yak_tpu.ops.countstep import lookup_pallas

    tk = np.zeros(cap, np.uint64)
    tc = np.full(cap, -1, np.int32)
    hs, cs = tpairs
    order = np.argsort(hs)
    tk[:len(hs)] = hs[order]
    tc[:len(hs)] = cs[order]
    args = (jnp.asarray(tk), jnp.asarray(tc), jnp.int32(len(hs)),
            jnp.asarray(batch), jnp.asarray(valid))
    got = lookup_pallas(*args, interpret=True)
    want = st.lookup(*args, packable=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lookup_join_basic():
    rng = np.random.default_rng(10)
    space = rng.integers(0, 1 << 62, 60000, dtype=np.uint64)
    hs = rng.choice(space, size=9000, replace=False).astype(np.uint64)
    cs = rng.integers(0, 1024, 9000).astype(np.int32)
    batch = rng.choice(space, size=20000, replace=True).astype(np.uint64)
    valid = rng.random(20000) < 0.95
    run_lookup((hs, cs), batch, valid, 1 << 14)


def test_lookup_join_dups_and_misses():
    """Heavy duplicate queries spanning tiles, plus all-absent and
    all-invalid stretches."""
    rng = np.random.default_rng(11)
    hot = np.uint64(777777)
    batch = np.full(20000, hot, np.uint64)
    batch[15000:18000] = rng.integers(0, 1 << 62, 3000, dtype=np.uint64)
    valid = np.ones(20000, bool)
    valid[18000:] = False
    hs = np.array([hot, 42], np.uint64)
    cs = np.array([1023, 7], np.int32)
    run_lookup((hs, cs), batch, valid, 1 << 14)


def test_lookup_join_empty_table():
    rng = np.random.default_rng(12)
    batch = rng.integers(0, 1 << 62, 12000, dtype=np.uint64)
    run_lookup((np.zeros(0, np.uint64), np.zeros(0, np.int32)),
               batch, np.ones(12000, bool), 1 << 14)
