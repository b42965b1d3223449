"""Vectorized canonical k-mer extraction.

The reference walks each sequence base-by-base with a rolling 2-bit
window (count.c:28-60).  On TPU the same computation is a windowed map
over a padded code batch [B, L] (code 4 = N or padding).

k <= 31 uses a bit-parallel formulation instead of a k-step unrolled
loop (which costs O(k) full passes over u64 accumulators — measured
~160ms per 4M-lane chunk): the 2-bit codes are split into two 1-bit
planes, each plane packs into u32 words (32 bases/word), and every
window's 31-bit plane value comes from ONE vectorized funnel shift
(w[q] >> r | w[q+1] << (32-r), broadcast over all (q, r)) — no gathers,
no per-base loop.  Forward values need the window bits reversed
(base j contributes bit k-1-j), done with a 5-step u32 bit-reverse;
reverse-complement values use the unreversed funnel output complemented.
A 5-step morton spread interleaves the two planes into the 2k-bit
packed k-mer, then yak's invertible hash applies (ops/hash.py).

Semantics (bit-for-bit with the reference):
- k <= 31 (count.c:28-43): fwd/rev 2-bit packing, canonical = min,
  hash = hash64(canonical, 4^k - 1).
- 32 <= k <= 63 (count.c:45-60): four 1-bit planes, hash = hash_long
  (inexact by design) — kept as the straightforward unrolled loop.
- windows containing any N (code >= 4) are invalid; N restarts the
  window, which in window terms means "window contains a 4 => invalid".
- the k-mer *end* position in the original sequence is start + k - 1
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
    if k <= 31:
        return _extract_bitparallel(codes, k)
    plo, phi, pnn = codes_to_planes(codes)
    return extract_from_planes(plo, phi, pnn, k, L)


def _valid_windows(codes, k):
    B = codes.shape[0]
    is_n = (codes >= 4).astype(jnp.int32)
    cs = jnp.cumsum(is_n, axis=1)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cs], axis=1)
    return (cs[:, k:] - cs[:, :-k]) == 0


def _pack_plane(bits, B, W):
    """Pack bool/0-1 u32 [B, W*32] into u32 words [B, W], LSB = first."""
    r = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    return jnp.sum(bits.reshape(B, W, 32).astype(jnp.uint32) << r,
                   axis=2, dtype=jnp.uint32)


def _funnel(words, k):
    """All 31-bit windows of a packed bit stream.

    words: u32 [B, W]; returns u32 [B, (W-1)*32] where out[:, 32q+r] =
    bits q*32+r .. +k-1 of the stream (LSB = first base of the window).
    """
    B, W = words.shape
    lo = words[:, :-1, None]                    # [B, W-1, 1]
    hi = words[:, 1:, None]
    r = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 32), 2)
    # (lo >> r) | (hi << (32-r)); r==0 must not shift hi by 32 (UB) —
    # shift in two steps so the 32-shift becomes a harmless full shift-out
    win = (lo >> r) | ((hi << (31 - r)) << 1)
    win = win.reshape(B, (W - 1) * 32)
    return win & jnp.uint32((1 << k) - 1)


def _funnel_rm(words, k):
    """R-MAJOR funnel: all k-bit windows of a packed bit stream as
    [B, 32, W-1] where out[:, r, q] = bits of the window starting at
    base 32q+r.  The q-major [B, (W-1)*32] form of _funnel has a
    32-wide minor dim that wastes 3/4 of every (8,128) TPU tile; this
    layout keeps the minor dim at W-1 (full lane utilization).  Window
    ORDER differs from base order — callers that sort the hashes anyway
    (the count path) don't care; position-aware callers (scan) must use
    _funnel."""
    B, W = words.shape
    lo = words[:, None, :-1]                   # [B, 1, W-1]
    hi = words[:, None, 1:]
    r = jax.lax.broadcasted_iota(jnp.uint32, (1, 32, 1), 1)
    win = (lo >> r) | ((hi << (31 - r)) << 1)
    return win & jnp.uint32((1 << k) - 1)


def rmajor_lanes(L):
    """Lane count of the r-major extraction for an L-base stream (a
    handful more than L-k+1; the extras are masked invalid)."""
    return 32 * (planes_words(L) - 1)


def _rmajor_index(shape):
    """Base position 32q+r per [B, 32, W-1] lane."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    q = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return 32 * q + r


def _hashes_rmajor(plo, phi, k):
    wlo = _funnel_rm(plo, k)
    whi = _funnel_rm(phi, k)
    m31 = jnp.uint32((1 << k) - 1)
    fwd_lo = _bitrev(wlo, k)
    fwd_hi = _bitrev(whi, k)
    rev_lo = (~wlo) & m31
    rev_hi = (~whi) & m31
    fwd = (_spread(fwd_lo.astype(jnp.uint64))
           | (_spread(fwd_hi.astype(jnp.uint64)) << jnp.uint64(1)))
    rev = (_spread(rev_lo.astype(jnp.uint64))
           | (_spread(rev_hi.astype(jnp.uint64)) << jnp.uint64(1)))
    canon = jnp.minimum(fwd, rev)
    mask = jnp.uint64((1 << (2 * k)) - 1)
    return hash64(canon, mask, ns=jnp)


def extract_periodic_rm(plo, phi, wvec, k, L, R):
    """R-major extract_periodic for the count path: hashes and validity
    as [B, 32, W-1] (window order != base order; the batch is sorted
    downstream so only the (hash, valid) pairing matters)."""
    h = _hashes_rmajor(plo, phi, k)
    i = _rmajor_index(h.shape)
    M = L - k + 1
    valid = ((i % (R + 1) <= R - k) & (i < M)
             & (i < (wvec.astype(jnp.int32) - (k - 1))[:, None, None]))
    return h, valid


def extract_from_planes_rm(plo, phi, pnn, k, L):
    """R-major extract_from_planes for the count path."""
    h = _hashes_rmajor(plo, phi, k)
    wnn = _funnel_rm(pnn, k)
    i = _rmajor_index(h.shape)
    valid = (wnn == 0) & (i < L - k + 1)
    return h, valid


def _words64(p32):
    """u32 plane words [B, W] -> u64 words [B, ceil(W/2)+1]: pair-merge
    plus one zero pad word past the end (the 64-funnel reads w[q+1];
    the pad bits are only reachable from lanes >= M, which every caller
    slices or masks away)."""
    B, W = p32.shape
    if W % 2:
        p32 = jnp.concatenate([p32, jnp.zeros((B, 1), jnp.uint32)],
                              axis=1)
    p = p32.reshape(B, -1, 2).astype(jnp.uint64)
    w = p[:, :, 0] | (p[:, :, 1] << jnp.uint64(32))
    return jnp.concatenate([w, jnp.zeros((B, 1), jnp.uint64)], axis=1)


def _funnel64(words, k):
    """All k-bit (k <= 63) windows of a packed bit stream, from u64
    words: out[:, 64q+r] = bits 64q+r .. +k-1 (LSB = first base)."""
    B, W = words.shape
    lo = words[:, :-1, None]                    # [B, W-1, 1]
    hi = words[:, 1:, None]
    r = jax.lax.broadcasted_iota(jnp.uint64, (1, 1, 64), 2)
    win = (lo >> r) | ((hi << (jnp.uint64(63) - r)) << jnp.uint64(1))
    win = win.reshape(B, (W - 1) * 64)
    return win & jnp.uint64((1 << k) - 1)


def _bitrev64(x, k):
    """Reverse the low k (<= 63) bits of u64 lanes (6-step swap)."""
    m = jnp.uint64
    x = ((x & m(0x5555555555555555)) << m(1)) | ((x >> m(1)) & m(0x5555555555555555))
    x = ((x & m(0x3333333333333333)) << m(2)) | ((x >> m(2)) & m(0x3333333333333333))
    x = ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F))
    x = ((x & m(0x00FF00FF00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF00FF00FF))
    x = ((x & m(0x0000FFFF0000FFFF)) << m(16)) | ((x >> m(16)) & m(0x0000FFFF0000FFFF))
    x = (x << m(32)) | (x >> m(32))
    return x >> m(64 - k)


def _hash_long_from_planes(plo, phi, k, M):
    """yak_hash_long (k in [32, 63]) via u64-word funnel shifts: the
    four 1-bit rolling planes of count.c:45-60 built bit-parallel in
    O(1) passes instead of the O(k) unrolled loop.

    Natural-order window bits w (bit j = base start+j) give:
      x0/x1 (forward, bit k-1-j)   = bitrev_k(w)
      x2/x3 (complement, bit j)    = ~w & mask
    matching the reference's shift-register construction exactly
    (oracle-verified via test_long_k_parity)."""
    wlo = _funnel64(_words64(plo), k)[:, :M]
    whi = _funnel64(_words64(phi), k)[:, :M]
    mask = jnp.uint64((1 << k) - 1)
    x0 = _bitrev64(wlo, k)
    x1 = _bitrev64(whi, k)
    x2 = (~wlo) & mask
    x3 = (~whi) & mask
    return hash_long(x0, x1, x2, x3, ns=jnp)


def _bitrev(x, k):
    """Reverse the low k (<=31) bits of u32 lanes (classic 5-step swap)."""
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    x = (x << 16) | (x >> 16)
    return x >> jnp.uint32(32 - k)


def _spread(x):
    """Morton-spread u64 lanes: bit i -> bit 2i (low 31 bits used)."""
    x = (x | (x << jnp.uint64(16))) & jnp.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << jnp.uint64(8))) & jnp.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << jnp.uint64(4))) & jnp.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << jnp.uint64(2))) & jnp.uint64(0x3333333333333333)
    x = (x | (x << jnp.uint64(1))) & jnp.uint64(0x5555555555555555)
    return x


def planes_words(L):
    """u32 words per plane for an L-base stream: one word of padding past
    the last base (the funnel reads w[q+1])."""
    return (L + 31) // 32 + 1


def codes_to_planes(codes):
    """Split u8 base codes [B, L] into LSB-first packed u32 bit planes
    (lo, hi, nn) of shape [B, planes_words(L)].  Device-side fallback;
    the hot ingest path packs these on host (io/pack.pack_planes) so the
    h2d transfer carries 3 bits/base instead of 8."""
    B, L = codes.shape
    W = planes_words(L)
    padL = W * 32
    if padL != L:
        codes = jnp.concatenate(
            [codes, jnp.full((B, padL - L), 4, jnp.uint8)], axis=1)
    lo = codes & jnp.uint8(1)
    hi = (codes >> jnp.uint8(1)) & jnp.uint8(1)
    nn = (codes >= 4).astype(jnp.uint8)
    return (_pack_plane(lo, B, W), _pack_plane(hi, B, W),
            _pack_plane(nn, B, W))


def extract_periodic(plo, phi, wvec, k, L, R):
    """Canonical k-mer hashes for PERIODIC chunk layouts: reads of a
    uniform length R separated by single N cells, with an all-N tail
    pad from base wvec[g] on (the fixed-length-FASTQ layout,
    io/pack.detect_periodic).  Validity is pure iota arithmetic — no N
    plane travels over the wire or is consulted at all:
    window i is valid iff it stays inside one period (i mod (R+1) <=
    R-k) and ends before the pad (i + k <= w).  k >= 32 hashes via the
    yak_hash_long funnel (_hash_long_from_planes)."""
    M = L - k + 1
    if k <= 31:
        h = _hashes_from_planes(plo, phi, k, M)
    else:
        h = _hash_long_from_planes(plo, phi, k, M)
    i = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    valid = ((i % (R + 1) <= R - k)
             & (i < (wvec.astype(jnp.int32) - (k - 1))[:, None]))
    return h, valid


def extract_from_planes(plo, phi, pnn, k, L):
    """Canonical (k <= 31) or yak_hash_long (k in [32, 63]) k-mer hashes
    from pre-packed bit planes.

    plo/phi/pnn: u32[B, planes_words(L)] LSB-first planes; positions
    >= L must be marked nn=1.  Returns (hashes u64[B, L-k+1], valid).
    """
    M = L - k + 1
    if k <= 31:
        wnn = _funnel(pnn, k)[:, :M]
        return _hashes_from_planes(plo, phi, k, M), wnn == 0
    wnn = _funnel64(_words64(pnn), k)[:, :M]
    return _hash_long_from_planes(plo, phi, k, M), wnn == 0


def _hashes_from_planes(plo, phi, k, M):
    wlo = _funnel(plo, k)[:, :M]     # natural order: bit j = base i+j
    whi = _funnel(phi, k)[:, :M]

    m31 = jnp.uint32((1 << k) - 1)
    fwd_lo = _bitrev(wlo, k)         # fwd wants bit k-1-j
    fwd_hi = _bitrev(whi, k)
    rev_lo = (~wlo) & m31            # complement, natural order
    rev_hi = (~whi) & m31

    fwd = (_spread(fwd_lo.astype(jnp.uint64))
           | (_spread(fwd_hi.astype(jnp.uint64)) << jnp.uint64(1)))
    rev = (_spread(rev_lo.astype(jnp.uint64))
           | (_spread(rev_hi.astype(jnp.uint64)) << jnp.uint64(1)))
    canon = jnp.minimum(fwd, rev)
    mask = jnp.uint64((1 << (2 * k)) - 1)
    return hash64(canon, mask, ns=jnp)


def _extract_bitparallel(codes, k):
    L = codes.shape[1]
    plo, phi, pnn = codes_to_planes(codes)
    return extract_from_planes(plo, phi, pnn, k, L)
