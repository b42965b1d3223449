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

Serial-order exactness: the reference inserts each shard buffer's keys
one at a time (htab.c:57-70), so a key's gate also sees bits set by
*other* keys earlier in the same chunk (cross-key false positives).
When the caller supplies each unique key's first-occurrence `rank`
(its serial position in the chunk's buffer order), the update sort is
keyed by (bit position, rank) and a per-position "earliest setter"
cummax recovers exactly which probes were visible at each key's first
occurrence — the device gate then matches the reference's serial
semantics bit-for-bit, and the result becomes chunk-size-invariant
(the filter state before rank r is the start state plus every
lower-rank key's bits, exactly as in the serial loop).  Without ranks
(or when the packed sort key would not fit 64 bits) the gate falls
back to chunk-start state + intra-key self hits; that only perturbs
which *singletons* hit false positives, and the two-pass `-b`
protocol's final output (counts >= 2 after shrink) is exact regardless
(verified in SURVEY §2.3/BASELINE).
"""

from functools import partial

import jax
import jax.numpy as jnp

from yak_tpu import YAK_BLK_SHIFT

_BLK_MASK = (1 << YAK_BLK_SHIFT) - 1  # 511
_U64_MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def make_bloom(n_shift):
    """Allocate 2^n_shift filter bits as uint32 words."""
    if n_shift < 5:
        raise ValueError("bloom n_shift too small")
    return jnp.zeros(1 << (n_shift - 5), jnp.uint32)


def exact_gate_fits(n_shift, n_hashes, rank_bound, shard_shift=0):
    """Whether the serial-exact gate's packed sort key fits 64 bits."""
    pos_bits = n_shift - shard_shift
    rank_bits = max(1, int(max(rank_bound - 1, 1)).bit_length())
    return n_hashes <= 8 and pos_bits + rank_bits + 3 < 64


def probe_geom(h, *, pre, n_shift, n_hashes, shard_shift=0):
    """Probe geometry of yak_bf_insert (bbf.c:25-33): the key's global
    block bit offset `base` and its n_hashes in-block bit positions
    `zs` (u32 each, < 512)."""
    ns_ = n_shift - pre
    xbits = ns_ - YAK_BLK_SHIFT
    shard = ((h & jnp.uint64((1 << pre) - 1))
             >> jnp.uint64(shard_shift)).astype(jnp.uint32)
    x = h >> jnp.uint64(pre)
    y = (x & jnp.uint64((1 << xbits) - 1)).astype(jnp.uint32)
    h1 = ((x >> jnp.uint64(xbits)) & jnp.uint64(_BLK_MASK)).astype(
        jnp.uint32)
    h2 = ((x >> jnp.uint64(ns_)) & jnp.uint64(_BLK_MASK)).astype(
        jnp.uint32)
    h2 = jnp.where((h2 & 31) == 0, (h2 + 1) & _BLK_MASK, h2)
    base = (shard.astype(jnp.uint64) << jnp.uint64(ns_)) | (
        y.astype(jnp.uint64) << jnp.uint64(YAK_BLK_SHIFT))
    zs = []
    z = h1
    for _ in range(n_hashes):
        zs.append(z)
        z = (z + h2) & _BLK_MASK
    return base, zs


def probe_count(bf, base, zs, active, want_needs=False):
    """Pre-update probe: per active key, how many of its probed bits
    are visible under chunk-start state + intra-key self hits.  All
    n_hashes probes of one key land in ITS 512-bit block, so ONE
    64-byte block gather replaces n_hashes random word gathers
    (measured r4: the per-word gathers were a dominant slice of the
    gated fold; random-access count, not bytes, is what TPU gathers
    charge for).  want_needs: also return the per-probe
    "active & bit NOT yet visible" masks (the serial-exact gate's
    input)."""
    n = base.shape[0]
    blk_words = 1 << (YAK_BLK_SHIFT - 5)          # 16 u32s per block
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

    n_before = jnp.zeros(n, jnp.int32)
    needs = []
    for i, zi in enumerate(zs):
        word = probe_word(zi)
        b = zi & jnp.uint32(31)
        was_set = (word >> b) & jnp.uint32(1)
        self_set = jnp.zeros(n, jnp.uint32)
        for j in range(i):
            self_set = self_set | (zs[j] == zi).astype(jnp.uint32)
        seen = ((was_set | self_set) & 1).astype(jnp.int32)
        if want_needs:
            needs.append(active & (seen == 0))
        n_before = n_before + jnp.where(active, seen, 0)
    return n_before, (needs if want_needs else None)


@partial(jax.jit,
         static_argnames=("pre", "n_shift", "n_hashes", "shard_shift",
                          "rank_bound"))
def bloom_insert(bf, h, active, rank=None, *, pre, n_shift, n_hashes,
                 shard_shift=0, rank_bound=0):
    """Query-and-set a batch of unique hashes.

    Returns (bf', n_before) where n_before[i] is the number of probed bits
    already set (reference `yak_bf_insert` return; insert into the table
    iff n_before == n_hashes).

    rank (optional, i32): serial first-occurrence position of each active
    key in its chunk's buffer order (< rank_bound, static).  When given
    and the packed key fits (exact_gate_fits), n_before is computed under
    the reference's exact serial order (see module docstring).

    shard_shift (mesh sharding): when chip d of 2^shard_shift owns the
    hashes with h & (2^shard_shift - 1) == d, its LOCAL filter holds only
    its own shards, indexed by shard >> shard_shift; per-shard filter
    contents stay bit-identical to the single-chip layout (the per-shard
    filters of htab.c:23-27 mapped onto per-chip slices).  `bf` must then
    be 2^(n_shift - shard_shift) bits.
    """
    n = h.shape[0]
    exact = (rank is not None
             and exact_gate_fits(n_shift, n_hashes, rank_bound,
                                 shard_shift))
    base, zs = probe_geom(h, pre=pre, n_shift=n_shift,
                          n_hashes=n_hashes, shard_shift=shard_shift)
    # 1. count already-set bits (pre-update state + intra-key self hits)
    n_before, needs = probe_count(bf, base, zs, active,
                                  want_needs=exact)

    act = jnp.broadcast_to(active, (n_hashes, n)).reshape(-1)
    if exact:
        # 2a. serial-exact gate: key the update sort by (bit position,
        # first-occurrence rank, probe index); the first lane of each
        # position run is the earliest setter, so a probe lane was
        # visible at its key's first occurrence iff its rank exceeds
        # the run head's (cross) — or the start state / an earlier
        # probe of the same call already covered it (need == False).
        # A carried (key, probe, need) payload makes the final restore
        # a single packed u32 sort back to key-major order.
        rank_bits = max(1, int(max(rank_bound - 1, 1)).bit_length())
        rmask = jnp.uint64((1 << rank_bits) - 1)
        r64 = jnp.clip(rank, 0, rank_bound - 1).astype(jnp.uint64)
        sh_rp = jnp.uint64(rank_bits + 3)
        vA = jnp.stack(
            [jnp.where(active,
                       ((base + zi.astype(jnp.uint64)) << sh_rp)
                       | (r64 << jnp.uint64(3)) | jnp.uint64(i),
                       _U64_MAX)
             for i, zi in enumerate(zs)], axis=0).reshape(-1)
        key_ix = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        pay = jnp.stack(
            [(key_ix << 4) | jnp.int32(i << 1)
             | needs[i].astype(jnp.int32)
             for i in range(n_hashes)], axis=0).reshape(-1)
        vA_s, pay_s = jax.lax.sort((vA, pay), num_keys=1,
                                   is_stable=False)
        valid_s = vA_s != _U64_MAX
        pos_s = vA_s >> sh_rp
        firstlane = jnp.concatenate(
            [jnp.ones((1,), bool), jnp.zeros((vA_s.shape[0] - 1,), bool)])
        prev = jnp.concatenate([pos_s[:1], pos_s[:-1]])
        run_first = firstlane | (pos_s != prev)
        uniq = valid_s & run_first
        # earliest setter's packed key, broadcast over the run (vA_s is
        # globally ascending, so a plain cummax reproduces the run head;
        # active packed keys are < 2^63 by exact_gate_fits, so the i64
        # cast is lossless and the u64-sentinel runs turn negative,
        # which cummax ignores)
        frk = jax.lax.cummax(
            jnp.where(run_first & valid_s, vA_s, jnp.uint64(0))
            .astype(jnp.int64)).astype(jnp.uint64)
        rk_s = (vA_s >> jnp.uint64(3)) & rmask
        first_rk = (frk >> jnp.uint64(3)) & rmask
        crossed = rk_s > first_rk      # an earlier key already set it
        bad = valid_s & ((pay_s & 1) == 1) & ~crossed
        v2 = (pay_s & ~1) | bad.astype(jnp.int32)
        (v2_s,) = jax.lax.sort((v2,), num_keys=1, is_stable=False)
        badm = (v2_s & 1).reshape(n, n_hashes)   # key-major, probe-minor
        n_before = jnp.where(
            active, jnp.int32(n_hashes) - jnp.sum(badm, axis=1,
                                                  dtype=jnp.int32),
            0)
    else:
        # 2b. conflict-free OR of all probed bits into the filter.
        # Bit positions fit pos_bits = n_shift - shard_shift bits, so
        # the inactive marker packs into the same word and the sort is
        # SINGLE-operand (u32 when it fits — sort cost scales with
        # operand count and width on this backend, ops/sorttable).
        pos_bits = n_shift - shard_shift
        allpos = jnp.stack(
            [base + zi.astype(jnp.uint64) for zi in zs],
            axis=0).reshape(-1)
        if pos_bits <= 31:
            packed = (allpos.astype(jnp.uint32)
                      | (act.astype(jnp.uint32) ^ 1) << pos_bits)
            (p_s,) = jax.lax.sort((packed,), num_keys=1,
                                  is_stable=False)
            valid_s = p_s < jnp.uint32(1 << pos_bits)
            p32 = p_s & jnp.uint32((1 << pos_bits) - 1)
            nwords = bf.shape[0]
            if nwords <= (1 << 22):
                # all-u32 dense tail (the hot -b24 shape).  Measured
                # (v5e): the generic tail's i64 word keys + u64 cumsum
                # nearly double its pass bytes; and a WRAPPING u32
                # cumsum is exact here because each word's unique-bit
                # mask sum fits u32, so the boundary differences are
                # exact mod 2^32.
                prev32 = jnp.concatenate([p32[:1], p32[:-1]])
                first = jnp.concatenate(
                    [jnp.ones((1,), bool),
                     jnp.zeros((p32.shape[0] - 1,), bool)])
                uniq32 = valid_s & (first | (p32 != prev32))
                w32 = jnp.where(valid_s, p32 >> jnp.uint32(5),
                                jnp.uint32(nwords))
                m32 = jnp.where(uniq32,
                                jnp.uint32(1) << (p32 & jnp.uint32(31)),
                                jnp.uint32(0))
                csum = jnp.concatenate([jnp.zeros(1, jnp.uint32),
                                        jnp.cumsum(m32)])
                bounds = jnp.searchsorted(
                    w32, jnp.arange(nwords + 1, dtype=jnp.uint32))
                word_mask = csum[bounds[1:]] - csum[bounds[:-1]]
                return bf | word_mask, n_before
            pos_s = p32.astype(jnp.uint64)
        elif pos_bits <= 63:
            packed = (allpos | (act.astype(jnp.uint64) ^ jnp.uint64(1))
                      << jnp.uint64(pos_bits))
            (p_s,) = jax.lax.sort((packed,), num_keys=1,
                                  is_stable=False)
            valid_s = p_s < (jnp.uint64(1) << jnp.uint64(pos_bits))
            pos_s = p_s & ((jnp.uint64(1) << jnp.uint64(pos_bits))
                           - jnp.uint64(1))
        else:
            inv = (~act).astype(jnp.uint8)
            inv_s, pos_s = jax.lax.sort((inv, allpos), num_keys=2,
                                        is_stable=False)
            valid_s = inv_s == 0
        prev = jnp.concatenate([pos_s[:1], pos_s[:-1]])
        firstlane = jnp.concatenate(
            [jnp.ones((1,), bool),
             jnp.zeros((pos_s.shape[0] - 1,), bool)])
        uniq = valid_s & (firstlane | (pos_s != prev))

    # OR the probed bits into the filter (shared tail; pos_s/valid_s/
    # uniq come from whichever sort ran above).
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
