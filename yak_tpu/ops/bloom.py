"""Blocked Bloom prefilter (counting pass 1), vectorized.

Reference semantics (bbf.c:25-42, one filter per `pre`-bit shard,
htab.c:23-27): for the shard-stripped hash x = h >> pre,
  block   = x & (2^(n_shift-pre-9) - 1)        (512-bit blocks)
  h1      = (x >> block_bits) & 511             (first probe)
  h2      = (x >> (n_shift-pre)) & 511          (stride; forced odd-ish:
                                                 if (h2 & 31) == 0, h2 += 1)
  probes  = h1, h1+h2, h1+2*h2, ... (mod 512), n_hashes of them
`insert` returns how many probed bits were already set; a k-mer enters the
count table only when all n_hashes bits were set (htab.c:63-64), i.e. on
its second-or-later sighting (up to false positives).

This module keeps the *entire* 2^n_shift-bit filter as one uint32 word
array laid out shard-major, so per-shard filters are bit-identical to the
reference's.  A batch of unique keys is processed as:
  1. gather the probed words (pre-update) and count set bits, correcting
     for intra-key probe collisions (the reference counts a bit set by an
     earlier probe of the *same* call, bbf.c:37-39);
  2. sort all probed bit positions, drop duplicates, segment-sum the bit
     masks per word (sum == OR once bits are unique), and scatter the
     merged masks back with a conflict-free set.

Cross-key read-before-write within one batch is an accepted divergence
from the reference's serial order; it only perturbs which *singletons*
hit false positives, and the two-pass `-b` protocol's final output
(counts >= 2 after shrink) is exact regardless (verified in SURVEY §2.3/BASELINE).
"""

from functools import partial

import jax
import jax.numpy as jnp

from yak_tpu import YAK_BLK_SHIFT

_BLK_MASK = (1 << YAK_BLK_SHIFT) - 1  # 511


def make_bloom(n_shift):
    """Allocate 2^n_shift filter bits as uint32 words."""
    if n_shift < 5:
        raise ValueError("bloom n_shift too small")
    return jnp.zeros(1 << (n_shift - 5), jnp.uint32)


@partial(jax.jit,
         static_argnames=("pre", "n_shift", "n_hashes", "shard_shift"))
def bloom_insert(bf, h, active, *, pre, n_shift, n_hashes, shard_shift=0):
    """Query-and-set a batch of unique hashes.

    Returns (bf', n_before) where n_before[i] is the number of probed bits
    already set (reference `yak_bf_insert` return; insert into the table
    iff n_before == n_hashes).

    shard_shift (mesh sharding): when chip d of 2^shard_shift owns the
    hashes with h & (2^shard_shift - 1) == d, its LOCAL filter holds only
    its own shards, indexed by shard >> shard_shift; per-shard filter
    contents stay bit-identical to the single-chip layout (the per-shard
    filters of htab.c:23-27 mapped onto per-chip slices).  `bf` must then
    be 2^(n_shift - shard_shift) bits.
    """
    n = h.shape[0]
    ns_ = n_shift - pre            # per-shard filter bits (log2)
    xbits = ns_ - YAK_BLK_SHIFT    # block-select bits
    shard = ((h & jnp.uint64((1 << pre) - 1))
             >> jnp.uint64(shard_shift)).astype(jnp.uint32)
    x = h >> jnp.uint64(pre)
    y = (x & jnp.uint64((1 << xbits) - 1)).astype(jnp.uint32)
    h1 = ((x >> jnp.uint64(xbits)) & jnp.uint64(_BLK_MASK)).astype(jnp.uint32)
    h2 = ((x >> jnp.uint64(ns_)) & jnp.uint64(_BLK_MASK)).astype(jnp.uint32)
    h2 = jnp.where((h2 & 31) == 0, (h2 + 1) & _BLK_MASK, h2)
    # global bit offset of this key's block
    base = (shard.astype(jnp.uint64) << jnp.uint64(ns_)) | (
        y.astype(jnp.uint64) << jnp.uint64(YAK_BLK_SHIFT))

    # probe bit positions z_i within the block
    zs = []
    z = h1
    for _ in range(n_hashes):
        zs.append(z)
        z = (z + h2) & _BLK_MASK

    # 1. count already-set bits (pre-update state + intra-key self hits).
    # All n_hashes probes of one key land in ITS 512-bit block, so ONE
    # 64-byte block gather replaces n_hashes random word gathers
    # (measured r4: the per-word gathers were a dominant slice of the
    # ~6.3s/group gated fold; random-access count, not bytes, is what
    # TPU gathers charge for).  The word within the block is then picked
    # with a 16-way one-hot select — pure vector ops, no second gather.
    blk_words = 1 << (YAK_BLK_SHIFT - 5)          # 16 u32s per block
    n_before = jnp.zeros(n, jnp.int32)
    if bf.shape[0] % blk_words == 0:
        blocks = bf.reshape(-1, blk_words)
        blk_ix = (base >> jnp.uint64(YAK_BLK_SHIFT)).astype(jnp.int64)
        rows = blocks[jnp.clip(blk_ix, 0, blocks.shape[0] - 1)]  # [n,16]
        wsel = jax.lax.broadcasted_iota(jnp.int32, (n, blk_words), 1)

        def probe_word(z):
            wcol = (z >> 5).astype(jnp.int32)
            return jnp.sum(jnp.where(wsel == wcol[:, None], rows, 0),
                           axis=1, dtype=jnp.uint32)
    else:  # degenerate sub-block filter: plain per-word gathers

        def probe_word(z):
            pos = base + z.astype(jnp.uint64)
            return bf[(pos >> jnp.uint64(5)).astype(jnp.int64)]

    for i in range(n_hashes):
        word = probe_word(zs[i])
        b = zs[i] & jnp.uint32(31)
        was_set = (word >> b) & jnp.uint32(1)
        self_set = jnp.zeros(n, jnp.uint32)
        for j in range(i):
            self_set = self_set | (zs[j] == zs[i]).astype(jnp.uint32)
        n_before = n_before + jnp.where(
            active, ((was_set | self_set) & 1).astype(jnp.int32), 0)

    # 2. conflict-free OR of all probed bits into the filter
    allpos = jnp.stack(
        [base + zi.astype(jnp.uint64) for zi in zs], axis=0).reshape(-1)
    act = jnp.broadcast_to(active, (n_hashes, n)).reshape(-1)
    inv = (~act).astype(jnp.uint8)
    inv_s, pos_s = jax.lax.sort((inv, allpos), num_keys=2, is_stable=False)
    valid_s = inv_s == 0
    prev = jnp.concatenate([pos_s[:1], pos_s[:-1]])
    firstlane = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.zeros((pos_s.shape[0] - 1,), bool)])
    uniq = valid_s & (firstlane | (pos_s != prev))
    # invalid lanes (contiguous tail after the sort) get a sentinel word
    # ABOVE every real one so w_s stays globally monotone
    w_s = jnp.where(valid_s, (pos_s >> jnp.uint64(5)).astype(jnp.int64),
                    jnp.int64(bf.shape[0]))
    m_s = jnp.where(uniq, jnp.uint32(1) << (pos_s & jnp.uint64(31)).astype(jnp.uint32),
                    jnp.uint32(0))
    # unique bits per word => per-word OR == per-word sum; merge via cumsum
    csum0 = jnp.concatenate([jnp.zeros((1,), jnp.uint64),
                             jnp.cumsum(m_s.astype(jnp.uint64))])
    nwords = bf.shape[0]
    if nwords <= (1 << 22):
        # DENSE update (filters <= 16MB, e.g. -b24's 2^19 words): word
        # w's probe lanes are the sorted range [bounds[w], bounds[w+1]);
        # its OR mask is a cumsum difference, and the filter update is a
        # pure elementwise OR — the old path's 2^26-lane scatter (+ its
        # gather of the old words) measured as the dominant cost of the
        # gated fold (TPU scatter ~7M lanes/s, CLAUDE.md).
        bounds = jnp.searchsorted(w_s, jnp.arange(nwords + 1,
                                                  dtype=jnp.int64))
        word_mask = (csum0[bounds[1:]] - csum0[bounds[:-1]]).astype(
            jnp.uint32)
        return bf | word_mask, n_before
    # SPARSE fallback (sharded giant filters, e.g. -b37): scatter only
    # run-end lanes' accumulated masks
    word_start = valid_s & (firstlane | (w_s != jnp.concatenate([w_s[:1] - 1, w_s[:-1]])))
    nxt_w = jnp.concatenate([w_s[1:], w_s[-1:] - 1])
    nxt_valid = jnp.concatenate([valid_s[1:], jnp.zeros((1,), bool)])
    word_end = valid_s & (~nxt_valid | (w_s != nxt_w))
    lane_ix = jax.lax.broadcasted_iota(jnp.int64, w_s.shape, 0)
    start_ix = jax.lax.cummax(jnp.where(word_start, lane_ix, jnp.int64(-1)))
    run_mask_sum = csum0[lane_ix + 1] - csum0[jnp.maximum(start_ix, 0)]
    word_mask = run_mask_sum.astype(jnp.uint32)  # bits unique => fits u32
    upd_w = jnp.where(word_end, w_s, jnp.int64(bf.shape[0]))
    old = bf[jnp.clip(upd_w, 0, bf.shape[0] - 1)]
    bf = bf.at[upd_w].set(old | word_mask, mode="drop")
    return bf, n_before
