"""Vectorized canonical k-mer extraction.

The reference walks each sequence base-by-base with a rolling 2-bit window
(count.c:28-60).  On TPU the same computation is a windowed map: for a
padded batch of base codes [B, L] (code 4 = N or padding), the k-mer
starting at column i is a static-slice reduction over columns i..i+k-1,
so the whole batch is k fused VPU passes — no scalar loop, no dynamic
shapes.

Semantics (must match the reference bit-for-bit):
- k <= 31 (count.c:28-43): forward 2-bit packing, reverse-complement
  packing, canonical = min(fwd, rev), hash = hash64(canonical, 4^k - 1).
- 32 <= k <= 63 (count.c:45-60): four 1-bit planes; hash = hash_long
  (inexact by design).
- Windows containing any N are invalid; N restarts the window, which in
  window terms simply means "window contains a 4 => invalid".
- The k-mer *end* position in the original sequence is start + k - 1
  (used by qv/trio/chkerr per-position logic).
"""

import jax
import jax.numpy as jnp

from yak_tpu.ops.hash import hash64, hash_long


def extract_kmer_hashes(codes, k):
    """Hash every k-mer window of a padded code batch.

    Args:
      codes: uint8[B, L] base codes (0-3 = ACGT, 4 = N/pad).
      k: k-mer length (1..63), static.

    Returns:
      hashes: uint64[B, L-k+1]; hashes[b, i] is the hash of the k-mer at
        start position i (end position i+k-1).  Undefined where invalid.
      valid: bool[B, L-k+1]; window contains no N/pad.
    """
    if not 1 <= k <= 63:
        raise ValueError(f"k must be in [1, 63], got {k}")
    B, L = codes.shape
    if L < k:
        return (jnp.zeros((B, 0), jnp.uint64), jnp.zeros((B, 0), bool))
    M = L - k + 1
    is_n = (codes >= 4).astype(jnp.int32)
    # valid[i] <=> no N in codes[i:i+k] (windowed sum of is_n == 0)
    cs = jnp.cumsum(is_n, axis=1)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cs], axis=1)
    valid = (cs[:, k:] - cs[:, :-k]) == 0

    if k <= 31:
        hashes = _hash_short(codes, k, M)
    else:
        hashes = _hash_long_planes(codes, k, M)
    return hashes, valid


def _hash_short(codes, k, M):
    mask = jnp.uint64((1 << (2 * k)) - 1)
    c64 = codes.astype(jnp.uint64)
    fwd = jnp.zeros_like(c64[:, :M])
    rev = jnp.zeros_like(c64[:, :M])
    three = jnp.uint64(3)
    for j in range(k):
        cj = c64[:, j : j + M] & three  # &3 keeps N windows harmless; masked by `valid`
        fwd = fwd | (cj << jnp.uint64(2 * (k - 1 - j)))
        rev = rev | ((three - cj) << jnp.uint64(2 * j))
    canon = jnp.minimum(fwd, rev)
    return hash64(canon, mask, ns=jnp)


def _hash_long_planes(codes, k, M):
    c64 = codes.astype(jnp.uint64)
    one = jnp.uint64(1)
    x0 = jnp.zeros_like(c64[:, :M])
    x1 = jnp.zeros_like(c64[:, :M])
    x2 = jnp.zeros_like(c64[:, :M])
    x3 = jnp.zeros_like(c64[:, :M])
    for j in range(k):
        cj = c64[:, j : j + M]
        lo = cj & one
        hi = (cj >> one) & one
        x0 = x0 | (lo << jnp.uint64(k - 1 - j))
        x1 = x1 | (hi << jnp.uint64(k - 1 - j))
        x2 = x2 | ((one - lo) << jnp.uint64(j))
        x3 = x3 | ((one - hi) << jnp.uint64(j))
    return hash_long(x0, x1, x2, x3, ns=jnp)
