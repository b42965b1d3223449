"""Unit tests for the hash family and k-mer extraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from yak_tpu.ops.hash import hash64, hash64_inv, hash64_64, hash_long
from yak_tpu.ops.kmers import extract_kmer_hashes
from yak_tpu.ops.encode import encode_bases


def test_hash64_invertible():
    rng = np.random.default_rng(0)
    for k in (5, 17, 31):
        mask = np.uint64((1 << (2 * k)) - 1)
        x = rng.integers(0, 1 << (2 * k), size=1000, dtype=np.uint64)
        h = hash64(x, mask, ns=np)
        back = hash64_inv(h, mask, ns=np)
        assert np.array_equal(back, x)


def test_hash64_jnp_matches_np():
    rng = np.random.default_rng(1)
    mask = np.uint64((1 << 62) - 1)
    x = rng.integers(0, 1 << 62, size=512, dtype=np.uint64)
    a = hash64(x, mask, ns=np)
    b = np.asarray(hash64(jnp.asarray(x), jnp.uint64(mask), ns=jnp))
    assert np.array_equal(a, b)
    a64 = hash64_64(x, ns=np)
    b64 = np.asarray(hash64_64(jnp.asarray(x), ns=jnp))
    assert np.array_equal(a64, b64)


def _py_kmer_hashes(codes, k):
    """Independent scalar-Python reimplementation of the rolling loop
    (the reference algorithm, count.c:28-43) as extraction ground truth."""
    out = {}
    mask = (1 << (2 * k)) - 1
    shift = (k - 1) * 2
    x0 = x1 = l = 0
    for i, c in enumerate(codes):
        c = int(c)
        if c < 4:
            x0 = ((x0 << 2) | c) & mask
            x1 = (x1 >> 2) | ((3 - c) << shift)
            l += 1
            if l >= k:
                y = min(x0, x1)
                out[i - k + 1] = int(hash64(np.uint64(y), np.uint64(mask), ns=np))
        else:
            l, x0, x1 = 0, 0, 0
    return out


@pytest.mark.parametrize("k", [3, 17, 31])
def test_extraction_matches_rolling_scan(k):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 5, size=500).astype(np.uint8)  # with Ns
    want = _py_kmer_hashes(codes, k)
    h, valid = extract_kmer_hashes(jnp.asarray(codes)[None, :], k)
    h, valid = np.asarray(h[0]), np.asarray(valid[0])
    got = {i: int(h[i]) for i in range(len(valid)) if valid[i]}
    assert got == want


def test_extraction_long_k():
    # k=33 plane construction vs scalar rolling loop (count.c:45-60)
    k = 33
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=200).astype(np.uint8)
    mask = (1 << k) - 1
    shift = k - 1
    x = [0, 0, 0, 0]
    want = {}
    l = 0
    for i, c in enumerate(codes):
        c = int(c)
        x[0] = ((x[0] << 1) | (c & 1)) & mask
        x[1] = ((x[1] << 1) | (c >> 1)) & mask
        x[2] = (x[2] >> 1) | ((1 - (c & 1)) << shift)
        x[3] = (x[3] >> 1) | ((1 - (c >> 1)) << shift)
        l += 1
        if l >= k:
            want[i - k + 1] = int(hash_long(*[np.uint64(v) for v in x], ns=np))
    h, valid = extract_kmer_hashes(jnp.asarray(codes)[None, :], k)
    h, valid = np.asarray(h[0]), np.asarray(valid[0])
    got = {i: int(h[i]) for i in range(len(valid)) if valid[i]}
    assert got == want


def test_encode_table():
    assert list(encode_bases(b"ACGTacgtUuN-")) == [0, 1, 2, 3, 0, 1, 2, 3,
                                                   3, 3, 4, 4]
