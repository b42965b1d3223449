"""Direct unit tests of ops/bloom.bloom_insert against a serial NumPy
reference of the C semantics (bbf.c:25-42 + htab.c:57-70): probe
positions, self-hit correction, the dense all-u32 update tail, the
sparse scatter tail, the serial-exact rank gate, and mesh shard
slicing."""

import numpy as np
import pytest

from yak_tpu import YAK_BLK_SHIFT

_BLK = (1 << YAK_BLK_SHIFT) - 1


def _ref_insert(bits, h, pre, n_shift, n_hashes, shard_shift=0):
    """Serial reference of yak_bf_insert over one key against a global
    bit array `bits` (numpy bool, already sliced per chip)."""
    ns_ = n_shift - pre
    xbits = ns_ - YAK_BLK_SHIFT
    shard = (h & ((1 << pre) - 1)) >> shard_shift
    x = h >> pre
    y = x & ((1 << xbits) - 1)
    h1 = (x >> xbits) & _BLK
    h2 = (x >> ns_) & _BLK
    if (h2 & 31) == 0:
        h2 = (h2 + 1) & _BLK
    base = (shard << ns_) | (y << YAK_BLK_SHIFT)
    cnt = 0
    z = h1
    for _ in range(n_hashes):
        pos = base + z
        if bits[pos]:
            cnt += 1
        else:
            bits[pos] = True
        z = (z + h2) & _BLK
    return cnt


def _ref_batch(h_list, pre, n_shift, n_hashes, shard_shift=0,
               serial=True, start_bits=None):
    nbits = 1 << (n_shift - shard_shift)
    bits = (np.zeros(nbits, bool) if start_bits is None
            else start_bits.copy())
    out = []
    if serial:
        for h in h_list:
            out.append(_ref_insert(bits, int(h), pre, n_shift,
                                   n_hashes, shard_shift))
    else:
        # cheap-gate semantics: every key sees the start state plus its
        # own earlier probes only; all bits OR'd in afterwards
        for h in h_list:
            b2 = bits.copy()
            out.append(_ref_insert(b2, int(h), pre, n_shift, n_hashes,
                                   shard_shift))
        for h in h_list:
            _ref_insert(bits, int(h), pre, n_shift, n_hashes,
                        shard_shift)
    return np.array(out), bits


def _bits_of(bf_dev):
    w = np.asarray(bf_dev)
    return ((w[:, None] >> np.arange(32)[None, :]) & 1).astype(
        bool).reshape(-1)


@pytest.mark.parametrize("n_shift,n_hashes", [(20, 4), (22, 3), (19, 1)])
def test_cheap_gate_matches_reference(n_shift, n_hashes):
    """Dense u32 tail: n_before = start state + self hits; final filter
    = OR of all probed bits (order-independent)."""
    import jax.numpy as jnp

    from yak_tpu.ops.bloom import bloom_insert, make_bloom

    pre = 10
    rng = np.random.default_rng(5)
    n = 512
    h = rng.integers(0, 1 << 50, n, dtype=np.uint64)
    h[50:60] = h[0]      # heavy duplicate (self-hit path)
    active = rng.random(n) < 0.9
    bf, n_before = bloom_insert(
        make_bloom(n_shift), jnp.asarray(h),
        jnp.asarray(active), pre=pre, n_shift=n_shift,
        n_hashes=n_hashes)
    ref_nb, ref_bits = _ref_batch(h[active], pre, n_shift, n_hashes,
                                  serial=False)
    got = np.asarray(n_before)[active]
    np.testing.assert_array_equal(got, ref_nb)
    assert np.asarray(n_before)[~active].sum() == 0
    np.testing.assert_array_equal(_bits_of(bf), ref_bits)


def test_sparse_tail_matches_dense():
    """Filters > 2^22 words take the scatter tail; same final bits and
    n_before as the reference on a small active set."""
    import jax.numpy as jnp

    from yak_tpu.ops.bloom import bloom_insert, make_bloom

    pre, n_shift, n_hashes = 10, 28, 4   # 2^23 words -> sparse tail
    rng = np.random.default_rng(7)
    n = 256
    h = rng.integers(0, 1 << 60, n, dtype=np.uint64)
    active = np.ones(n, bool)
    bf, n_before = bloom_insert(
        make_bloom(n_shift), jnp.asarray(h), jnp.asarray(active),
        pre=pre, n_shift=n_shift, n_hashes=n_hashes)
    ref_nb, ref_bits = _ref_batch(h, pre, n_shift, n_hashes,
                                  serial=False)
    np.testing.assert_array_equal(np.asarray(n_before), ref_nb)
    np.testing.assert_array_equal(_bits_of(bf), ref_bits)


def test_serial_exact_gate_matches_serial_reference():
    """rank-tagged gate: n_before equals the literal serial loop even
    for cross-key collisions inside one batch."""
    import jax.numpy as jnp

    from yak_tpu.ops.bloom import bloom_insert, make_bloom

    pre, n_shift, n_hashes = 10, 19, 4   # tiny filter -> dense collisions
    rng = np.random.default_rng(11)
    n = 1024
    h = np.sort(rng.integers(0, 1 << 40, n, dtype=np.uint64))
    h = np.unique(h)
    n = len(h)
    rank = rng.permutation(n).astype(np.int32)  # arbitrary serial order
    bf, n_before = bloom_insert(
        make_bloom(n_shift), jnp.asarray(h),
        jnp.ones(n, bool), jnp.asarray(rank), pre=pre,
        n_shift=n_shift, n_hashes=n_hashes, rank_bound=n)
    order = np.argsort(rank)
    ref_nb_serial, ref_bits = _ref_batch(h[order], pre, n_shift,
                                         n_hashes, serial=True)
    ref_nb = np.empty(n, np.int64)
    ref_nb[order] = ref_nb_serial
    np.testing.assert_array_equal(np.asarray(n_before), ref_nb)
    np.testing.assert_array_equal(_bits_of(bf), ref_bits)


def test_shard_shift_slices():
    """Mesh slicing: chip d's local filter over its own shards matches
    the reference filter sliced the same way."""
    import jax.numpy as jnp

    from yak_tpu.ops.bloom import bloom_insert

    pre, n_shift, n_hashes, nlog = 10, 21, 4, 2
    rng = np.random.default_rng(13)
    h = rng.integers(0, 1 << 50, 512, dtype=np.uint64)
    d = 3
    mine = h[(h & np.uint64((1 << nlog) - 1)) == d]
    nbits = 1 << (n_shift - nlog)
    bf0 = jnp.zeros(nbits // 32, jnp.uint32)
    bf, n_before = bloom_insert(
        bf0, jnp.asarray(mine), jnp.ones(len(mine), bool), pre=pre,
        n_shift=n_shift, n_hashes=n_hashes, shard_shift=nlog)
    ref_nb, ref_bits = _ref_batch(mine, pre, n_shift, n_hashes,
                                  shard_shift=nlog, serial=False)
    np.testing.assert_array_equal(np.asarray(n_before), ref_nb)
    np.testing.assert_array_equal(_bits_of(bf), ref_bits)
